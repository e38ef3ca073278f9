"""The 9 subscription-filter dialects -> one boolean Column.

Dispatch and semantics from the reference
(server/trigger/filter/trigger_filter.go:25-51 extractFilter order
exact -> prefix -> suffix -> not -> cesql -> cel -> all -> any;
a filter LIST is an implicit AND, trigger_filter.go:68-78; nil/empty
filter passes everything, trigger_filter.go:79-84).

Attribute addressing (common.go:38-67):
- key ``"data"``       -> compare against the raw JSON payload string
- key ``"data.x.y"``   -> JSONPath ``$.x.y`` into the payload
- anything else        -> envelope attribute (spec attr or extension)

Missing attribute / JSONPath / parse error  => filter FAILS
(common.go:69-111). Under Spark's three-valued logic a missing
attribute yields NULL, and NULL-as-false is exactly what ``WHERE``
does at the top level and what AND/OR propagation preserves — so
predicates stay UNWRAPPED (keeping them eligible for Parquet
predicate pushdown) and ``coalesce(p, false)`` is applied only at
``not`` boundaries, the one place two-valued and three-valued logic
diverge (missing attr => inner fails => NOT must PASS, not NULL).

Empty key or empty value => that dialect object is DISCARDED (treated
as pass, common.go:43-47).

Everything compiles to a Catalyst expression tree: filters run in
whole-stage codegen and push down to the Parquet scan where the
referenced columns allow.
"""

from __future__ import annotations

from functools import reduce
from typing import Any

from pyspark.sql import Column, functions as F

from vanus_spark.cel import cel_to_column
from vanus_spark.cesql import cesql_to_column
from vanus_spark.jsonpath import get_json_col
from vanus_spark.model import attribute_column

_DIALECT_ORDER = ["exact", "prefix", "suffix", "not", "cesql", "ce_sql", "cel", "all", "any"]


def _coalesce_false(c: Column) -> Column:
    return F.coalesce(c, F.lit(False))


def _pair_predicate(key: str, value: str, op: str, data_col: str) -> Column | None:
    """One (key, value) condition for exact/prefix/suffix."""
    if key == "" or value == "":
        return None  # discarded filter => pass (common.go:43-47)
    if key == "data":
        target = F.col(data_col)
    elif key.startswith("data.") and len(key) > 5:
        target = get_json_col(data_col, "$." + key[5:])
    else:
        target = attribute_column(key).cast("string")
    if op == "exact":
        return target == F.lit(value)
    if op == "prefix":
        return target.startswith(value)
    if op == "suffix":
        return target.endswith(value)
    raise ValueError(op)


def _common_filter(value: dict[str, str], op: str, data_col: str) -> Column:
    preds = [_pair_predicate(k, v, op, data_col) for k, v in value.items()]
    preds = [p for p in preds if p is not None]
    if not preds:
        return F.lit(True)
    return reduce(lambda a, b: a & b, preds)


def compile_filter(spec: dict[str, Any] | list | None, data_col: str = "data") -> Column:
    """Compile a SubscriptionFilter (or list = implicit AND) to a
    boolean Column. Returns lit(True) for nil/empty."""
    if spec is None:
        return F.lit(True)
    if isinstance(spec, list):
        if not spec:
            return F.lit(True)
        return reduce(lambda a, b: a & b, (compile_filter(f, data_col) for f in spec))
    dialect = None
    for d in _DIALECT_ORDER:
        if d in spec:
            dialect = d
            break
    if dialect is None:
        return F.lit(True)
    body = spec[dialect]
    if dialect in ("exact", "prefix", "suffix"):
        return _common_filter(body, dialect, data_col)
    if dialect == "not":
        # inner fail => NOT passes (not_filter.go:27-40): coalesce the
        # inner to two-valued before negating so NULL -> false -> true.
        return ~_coalesce_false(compile_filter(body, data_col))
    if dialect in ("cesql", "ce_sql"):
        return cesql_to_column(body)
    if dialect == "cel":
        return cel_to_column(body, data_col)
    if dialect == "all":
        if not body:
            return F.lit(True)
        return reduce(lambda a, b: a & b, (compile_filter(f, data_col) for f in body))
    if dialect == "any":
        if not body:
            return F.lit(True)
        return reduce(lambda a, b: a | b, (compile_filter(f, data_col) for f in body))
    raise ValueError(f"unknown filter dialect {dialect}")
