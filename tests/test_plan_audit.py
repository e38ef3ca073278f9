"""Plan audit: every registered query's physical plan is screened for
scale red flags. This is the automated form of the per-round manual
`.explain()` review — it catches a regression where an operator
silently picks up a cartesian product or loses its parquet scan.

Red flags:
- ``CartesianProduct`` — the non-broadcast cross join (a broadcast
  1-row total via BroadcastNestedLoopJoin is fine and expected).

The audit only PLANS (no job runs for the plan inspection itself),
but several query builders do bounded driver work while constructing
(k-means model collects, BPE training, streaming replays), so the
sweep runs at sf0.001 and is marked slow-ish but kept in the default
suite — it is the widest single guard in the repo.
"""

from __future__ import annotations

import importlib.util

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry_audit__", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_no_cartesian_products_anywhere(spark):
    m = _entry()
    failures = []
    for name, fn in m.queries().items():
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: failed to plan: {e}")
            continue
        if "CartesianProduct" in plan:
            failures.append(f"{name}: CartesianProduct in physical plan")
    assert not failures, "\n".join(failures)


def test_r8_rolling_share_pushes_shipdate_filter(spark):
    """brand_rolling_share's 1995 predicate must reach the parquet
    scan (PushedFilters on l_shipdate), not evaluate post-scan — the
    difference between reading one year and reading the table at
    100 TB."""
    m = _entry()
    df = m.queries()["brand_rolling_share"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    import re

    pushed = re.findall(r"PushedFilters: \[[^\]]*l_shipdate[^\]]*\]", plan)
    assert pushed, "l_shipdate predicate not pushed to the scan"


def test_r8_hhi_uses_partial_aggregation(spark):
    """supplier_hhi's rollups must be map-side combined (HashAggregate
    pairs with a partial mode before the exchange), so the shuffle
    carries per-supplier partials, never raw lineitem rows."""
    m = _entry()
    df = m.queries()["supplier_hhi"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_" in plan or "HashAggregate" in plan
    # the scan must prune to the 3 needed lineitem columns
    import re

    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    li = [s for s in schemas if "l_extendedprice" in s]
    assert li and all("l_comment" not in s and len(s.split(",")) <= 4
                      for s in li), f"lineitem scan not pruned: {li}"
