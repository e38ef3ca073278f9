"""Filter dialect golden tests (FIXTURES.md §4, SURVEY §2.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vanus_spark.filters import compile_filter


def _count(df, spec):
    return df.where(compile_filter(spec)).count()


def test_exact_attr(cloudevents, events):
    expected = events.where(F.col("event_type") == "purchase").count()
    assert _count(cloudevents, {"exact": {"type": "purchase"}}) == expected
    assert expected > 0


def test_exact_multiple_is_and(cloudevents, events):
    spec = {"exact": {"type": "purchase", "source": "/test/source"}}
    expected = events.where(F.col("event_type") == "purchase").count()
    assert _count(cloudevents, spec) == expected
    spec2 = {"exact": {"type": "purchase", "source": "/other"}}
    assert _count(cloudevents, spec2) == 0


def test_prefix_suffix(cloudevents, events):
    assert _count(cloudevents, {"prefix": {"type": "sign"}}) == events.where(
        F.col("event_type").startswith("sign")
    ).count()
    assert _count(cloudevents, {"suffix": {"type": "up"}}) == events.where(
        F.col("event_type").endswith("up")
    ).count()


def test_data_jsonpath_exact(cloudevents, events):
    expected = events.where(F.get_json_object("props", "$.k") == "12").count()
    assert _count(cloudevents, {"exact": {"data.props.k": "12"}}) == expected
    assert expected > 0


def test_missing_attr_fails(cloudevents):
    # subject is NULL for every event -> exact on it fails all rows
    assert _count(cloudevents, {"exact": {"subject": "x"}}) == 0


def test_not_missing_attr_passes_all(cloudevents):
    # missing attr => inner fails => NOT passes (not_filter.go:27-40)
    total = cloudevents.count()
    assert _count(cloudevents, {"not": {"exact": {"subject": "x"}}}) == total


def test_empty_key_or_value_discards(cloudevents):
    total = cloudevents.count()
    assert _count(cloudevents, {"exact": {"type": ""}}) == total
    assert _count(cloudevents, {"exact": {"": "x"}}) == total


def test_all_any_nesting(cloudevents, events):
    spec = {
        "any": [
            {"exact": {"type": "error"}},
            {"all": [{"prefix": {"type": "sign"}}, {"suffix": {"type": "up"}}]},
        ]
    }
    expected = events.where(
        (F.col("event_type") == "error")
        | (F.col("event_type").startswith("sign") & F.col("event_type").endswith("up"))
    ).count()
    assert _count(cloudevents, spec) == expected


def test_filter_list_is_and(cloudevents, events):
    spec = [{"exact": {"type": "purchase"}}, {"cel": "$value.(double) > 50.0"}]
    expected = events.where(
        (F.col("event_type") == "purchase") & (F.col("value") > 50.0)
    ).count()
    assert _count(cloudevents, spec) == expected


def test_nil_filter_passes(cloudevents):
    assert _count(cloudevents, None) == cloudevents.count()
    assert _count(cloudevents, []) == cloudevents.count()


def test_cesql(cloudevents, events):
    spec = {"ce_sql": "type = 'error' AND EXISTS partitionkey"}
    expected = events.where(F.col("event_type") == "error").count()
    assert _count(cloudevents, spec) == expected


def test_cesql_like_in_arith(cloudevents, events):
    assert _count(cloudevents, {"ce_sql": "type LIKE 's%p'"}) == events.where(
        F.col("event_type").like("s%p")
    ).count()
    assert _count(
        cloudevents, {"ce_sql": "type IN ('error', 'view')"}
    ) == events.where(F.col("event_type").isin("error", "view")).count()
    # arithmetic + comparison over a numeric-valued extension attr
    assert _count(
        cloudevents, {"ce_sql": "partitionkey * 2 >= 20"}
    ) == events.where(F.col("user_id") * 2 >= 20).count()


def test_cel_typed_vars(cloudevents, events):
    assert _count(cloudevents, {"cel": "$user_id.(int64) > 10"}) == events.where(
        F.col("user_id") > 10
    ).count()
    assert _count(
        cloudevents, {"cel": '$props.k.(int64) >= 50 && $user_id.(int64) < 8'}
    ) == events.where(
        (F.get_json_object("props", "$.k").cast("long") >= 50) & (F.col("user_id") < 8)
    ).count()


def test_cel_bad_extract_fails_filter(cloudevents):
    # non-existent path -> NULL -> coalesce false -> all rows fail
    assert _count(cloudevents, {"cel": "$nope.xyz.(int64) > 0"}) == 0


# ---------------------------------------------------------------------------
# single-parse consolidation (round 4)
# ---------------------------------------------------------------------------


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_multi_data_paths_single_parse(cloudevents, events):
    """>=2 data paths: one from_json in the physical plan, zero
    get_json_object; semantics unchanged vs the per-path compile."""
    spec = {
        "all": [
            {"exact": {"data.props.k": "12"}},
            {"prefix": {"data.user_id": "1"}},
        ]
    }
    out = cloudevents.where(compile_filter(spec))
    plan = _plan(out)
    # ONE shared parse binding; no per-path get_json_object parses
    assert plan.count("transform(array(from_json") >= 1
    assert "get_json_object" not in plan
    expected = events.where(
        (F.get_json_object("props", "$.k") == "12")
        & F.col("user_id").cast("string").startswith("1")
    ).count()
    assert out.count() == expected
    assert expected > 0


def test_multi_data_attr_conjunct_stays_pushable(events):
    """A pure-attribute conjunct alongside the data conjuncts compiles
    OUTSIDE the from_json binding and reaches the parquet scan as a
    pushed filter (needs the UNCACHED frame — the cached fixture has
    no parquet scan to push into)."""
    from vanus_spark.model import events_to_cloudevents

    spec = [
        {"exact": {"type": "purchase"}},
        {"exact": {"data.props.k": "12"}},
        {"prefix": {"data.user_id": "1"}},
    ]
    # perturb the plan so Spark's cache manager does NOT substitute the
    # cached cloudevents fixture (cache lookup matches plan fragments)
    out = events_to_cloudevents(events.where(F.col("event_id") >= 0)).where(
        compile_filter(spec)
    )
    plan = _plan(out)
    assert plan.count("transform(array(from_json") >= 1
    # the attr predicate must appear in PushedFilters on the scan
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "event_type" in pushed or "type" in pushed


def test_single_data_path_keeps_get_json_object(cloudevents):
    """One data path: no consolidation, the plain get_json_object
    route (cheaper than from_json for a single leaf)."""
    out = cloudevents.where(compile_filter({"exact": {"data.props.k": "12"}}))
    plan = _plan(out)
    assert "get_json_object" in plan
    assert "transform(array(from_json" not in plan


def test_multi_data_under_any_and_not(cloudevents, events):
    """Consolidation preserves three-valued semantics through any/not
    boundaries: missing path => inner fails => NOT passes."""
    spec = {
        "any": [
            {"exact": {"data.props.k": "12"}},
            {"not": {"exact": {"data.user_id": "1"}}},
        ]
    }
    out = cloudevents.where(compile_filter(spec))
    assert _plan(out).count("transform(array(from_json") >= 1
    expected = events.where(
        (F.get_json_object("props", "$.k") == "12")
        | ~F.coalesce(F.col("user_id").cast("string") == "1", F.lit(False))
    ).count()
    assert out.count() == expected


def test_prefix_conflict_path_falls_back(cloudevents, events):
    """$.props (interior object) alongside $.props.k: the deeper path
    can't share a struct leaf with its prefix — the interior-object
    path keeps get_json_object while others still consolidate."""
    spec = {
        "all": [
            {"prefix": {"data.props": "{"}},
            {"exact": {"data.props.k": "12"}},
            {"prefix": {"data.user_id": "1"}},
        ]
    }
    out = cloudevents.where(compile_filter(spec))
    plan = _plan(out)
    assert plan.count("transform(array(from_json") >= 1
    assert "get_json_object" in plan  # the $.props interior path
    expected = events.where(
        (F.get_json_object("props", "$.k") == "12")
        & F.col("user_id").cast("string").startswith("1")
    ).count()
    assert out.count() == expected


def test_consolidation_equivalence_on_random_specs(cloudevents):
    """Seeded sweep: for random filter trees mixing attribute and
    data.x keys, the consolidated compile (shared from_json) must
    select exactly the rows of the per-path get_json_object compile."""
    import random

    from vanus_spark.filters import _compile

    rng = random.Random(42)
    keys = ["type", "subject", "data.props.k", "data.user_id", "data.value", "data"]
    vals = ["12", "1", "purchase", "sign", "up", "x", '{"user_id":1,']
    ops = ["exact", "prefix", "suffix"]

    def leaf():
        return {rng.choice(ops): {rng.choice(keys): rng.choice(vals)}}

    def tree(depth):
        r = rng.random()
        if depth == 0 or r < 0.4:
            return leaf()
        if r < 0.6:
            return {"not": tree(depth - 1)}
        if r < 0.8:
            return {"all": [tree(depth - 1) for _ in range(rng.randint(1, 3))]}
        return {"any": [tree(depth - 1) for _ in range(rng.randint(1, 3))]}

    ids = F.col("id")
    for _ in range(25):
        spec = tree(2)
        consolidated = {
            r[0] for r in cloudevents.where(compile_filter(spec)).select(ids).collect()
        }
        plain = {
            r[0]
            for r in cloudevents.where(_compile(spec, "data", None)).select(ids).collect()
        }
        assert consolidated == plain, spec
