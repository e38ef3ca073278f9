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

SINGLE-PARSE data predicates (reference parses the payload once per
event, pkg/json.go:26-28): when the spec references two or more
distinct ``data.x.y`` paths, the payload is parsed ONCE with
``from_json`` over the minimal struct schema of those paths, and each
path compiles to a struct field read — instead of one
``get_json_object`` (= one full JSON parse) per path. Top-level
conjuncts that never touch ``data.*`` are compiled OUTSIDE the parse
binding, so plain attribute predicates keep their Parquet pushdown
eligibility; a data-touching predicate was never pushable anyway.
"""

from __future__ import annotations

from functools import reduce
from typing import Any, Callable

from pyspark.sql import Column, functions as F

from vanus_spark.cel import _schema_for_paths, cel_to_column
from vanus_spark.cesql import cesql_to_column
from vanus_spark.jsonpath import get_json_col
from vanus_spark.model import attribute_column

_DIALECT_ORDER = ["exact", "prefix", "suffix", "not", "cesql", "ce_sql", "cel", "all", "any"]

# extract(jsonpath "$.x.y") -> Column producing the stringified value
_Extract = Callable[[str], Column]


def _coalesce_false(c: Column) -> Column:
    return F.coalesce(c, F.lit(False))


def _dialect_of(spec: dict) -> str | None:
    for d in _DIALECT_ORDER:
        if d in spec:
            return d
    return None


def _pair_predicate(
    key: str, value: str, op: str, data_col: str, extract: _Extract | None
) -> Column | None:
    """One (key, value) condition for exact/prefix/suffix."""
    if key == "" or value == "":
        return None  # discarded filter => pass (common.go:43-47)
    if key == "data":
        target = F.col(data_col)
    elif key.startswith("data.") and len(key) > 5:
        path = "$." + key[5:]
        target = extract(path) if extract is not None else None
        if target is None:  # not in the consolidated path set
            target = get_json_col(data_col, path)
    else:
        target = attribute_column(key).cast("string")
    if op == "exact":
        return target == F.lit(value)
    if op == "prefix":
        return target.startswith(value)
    if op == "suffix":
        return target.endswith(value)
    raise ValueError(op)


def _common_filter(
    value: dict[str, str], op: str, data_col: str, extract: _Extract | None
) -> Column:
    preds = [_pair_predicate(k, v, op, data_col, extract) for k, v in value.items()]
    preds = [p for p in preds if p is not None]
    if not preds:
        return F.lit(True)
    return reduce(lambda a, b: a & b, preds)


def _compile(
    spec: dict[str, Any] | list | None,
    data_col: str,
    extract: _Extract | None,
    data_schema=None,
) -> Column:
    if spec is None:
        return F.lit(True)
    if isinstance(spec, list):
        if not spec:
            return F.lit(True)
        return reduce(
            lambda a, b: a & b,
            (_compile(f, data_col, extract, data_schema) for f in spec),
        )
    dialect = _dialect_of(spec)
    if dialect is None:
        return F.lit(True)
    body = spec[dialect]
    if dialect in ("exact", "prefix", "suffix"):
        return _common_filter(body, dialect, data_col, extract)
    if dialect == "not":
        # inner fail => NOT passes (not_filter.go:27-40): coalesce the
        # inner to two-valued before negating so NULL -> false -> true.
        return ~_coalesce_false(_compile(body, data_col, extract, data_schema))
    if dialect in ("cesql", "ce_sql"):
        return cesql_to_column(body)
    if dialect == "cel":
        # CEL binds its own single-parse internally (cel.py); an
        # inferred payload schema extends it to array-indexed paths
        return cel_to_column(body, data_col, data_schema)
    if dialect == "all":
        if not body:
            return F.lit(True)
        return reduce(
            lambda a, b: a & b,
            (_compile(f, data_col, extract, data_schema) for f in body),
        )
    if dialect == "any":
        if not body:
            return F.lit(True)
        return reduce(
            lambda a, b: a | b,
            (_compile(f, data_col, extract, data_schema) for f in body),
        )
    raise ValueError(f"unknown filter dialect {dialect}")


# ---------------------------------------------------------------------------
# single-parse consolidation
# ---------------------------------------------------------------------------

def _is_struct_path(path: str) -> bool:
    """Array-indexed paths ($.a[0]) aren't expressible as a struct
    schema — those keep the get_json_object route."""
    return "[" not in path


def _spec_data_paths(spec: dict[str, Any] | list | None) -> list[str]:
    """JSONPaths referenced by exact/prefix/suffix ``data.x`` keys in
    the spec tree (cel/cesql handle their own parsing and are not
    descended into)."""
    out: list[str] = []
    if isinstance(spec, list):
        for s in spec:
            out += _spec_data_paths(s)
        return out
    if not isinstance(spec, dict):
        return out
    dialect = _dialect_of(spec)
    if dialect is None:
        return out
    body = spec[dialect]
    if dialect in ("exact", "prefix", "suffix"):
        for k, v in body.items():
            if k.startswith("data.") and len(k) > 5 and v != "":
                out.append("$." + k[5:])
    elif dialect == "not":
        out += _spec_data_paths(body)
    elif dialect in ("all", "any"):
        for s in body:
            out += _spec_data_paths(s)
    return out


def _split_conjuncts(spec: dict[str, Any] | list) -> list[dict[str, Any]]:
    """Flatten the top-level AND structure (list specs and ``all``)
    into independent conjuncts."""
    if isinstance(spec, list):
        return [c for s in spec for c in _split_conjuncts(s)]
    if isinstance(spec, dict) and _dialect_of(spec) == "all":
        return [c for s in spec["all"] for c in _split_conjuncts(s)]
    return [spec]


def _compile_single_parse(
    conjuncts: list[dict[str, Any]],
    data_col: str,
    paths: list[str],
    data_schema=None,
) -> Column:
    """Compile the data-touching conjuncts' AND inside ONE from_json
    binding: the payload parses once (the lambda's array element),
    every path is a struct field read. Same binding trick as cel.py —
    inlining from_json per path leaves N parses in the physical plan
    (no CSE across predicate subtrees).

    With ``data_schema`` (inferred, schema_infer.py) the parse uses
    the payload's REAL schema, so array-indexed paths consolidate too;
    leaves read back through a string cast to keep get_json_object's
    text semantics."""
    from vanus_spark.schema_infer import resolve_json_path_col

    schema = data_schema if data_schema is not None else _schema_for_paths(paths)
    consolidated = set(paths)

    def build(s: Column) -> Column:
        def extract(path: str) -> Column | None:
            if path not in consolidated:
                return None  # caller falls back to get_json_object
            if data_schema is not None:
                return resolve_json_path_col(s, data_schema, path)
            cur = s
            for part in path[2:].split("."):
                cur = cur[part]
            return cur

        return _compile(conjuncts, data_col, extract, data_schema)

    parsed = F.from_json(F.col(data_col), schema)
    return F.get(F.transform(F.array(parsed), build), 0)


def compile_filter(
    spec: dict[str, Any] | list | None,
    data_col: str = "data",
    data_schema=None,
) -> Column:
    """Compile a SubscriptionFilter (or list = implicit AND) to a
    boolean Column. Returns lit(True) for nil/empty.

    Specs referencing >= 2 distinct ``data.x`` paths compile to one
    ``from_json`` parse shared by all of them (see module docstring);
    attribute-only conjuncts stay outside the parse binding so Parquet
    pushdown is unaffected.

    ``data_schema`` — a StructType, typically from
    ``schema_infer.infer_data_schema(df)`` — switches the parse to the
    payload's real (inferred) schema: array-indexed paths become
    consolidatable and CEL sub-filters bind the same way. Paths that
    don't resolve to atomic leaves keep the per-path
    ``get_json_object`` route, so a partially-inferable payload still
    compiles correctly.
    """
    if spec is None:
        return F.lit(True)
    conjuncts = _split_conjuncts(spec)
    data_cj = [c for c in conjuncts if _spec_data_paths(c)]
    if data_schema is not None:
        from vanus_spark.schema_infer import FRACTIONAL_TYPES, resolve_json_path

        # the inferred schema decides consolidatability: anything
        # resolving to an atomic NON-FRACTIONAL leaf (array indices
        # included) joins the single parse — these filters compare
        # TEXT, and a fractional leaf's rendering diverges from the
        # raw token ('3.0' vs '3'); the rest keeps get_json_object
        def _textual(p: str) -> bool:
            r = resolve_json_path(data_schema, p)
            return r is not None and not isinstance(r[1], FRACTIONAL_TYPES)

        paths = sorted(
            {p for c in data_cj for p in _spec_data_paths(c) if _textual(p)}
        )
    else:
        candidates = {
            p for c in data_cj for p in _spec_data_paths(c) if _is_struct_path(p)
        }
        # a path that is a strict prefix of another addresses an interior
        # object — not expressible as a struct-schema leaf; it keeps the
        # get_json_object route while the deeper paths consolidate
        paths = sorted(
            p
            for p in candidates
            if not any(o != p and o.startswith(p + ".") for o in candidates)
        )
    if len(paths) >= 2:
        plain = [c for c in conjuncts if c not in data_cj]
        bound = _compile_single_parse(data_cj, data_col, paths, data_schema)
        if not plain:
            return bound
        rest = _compile(plain, data_col, None, data_schema)
        return rest & bound
    return _compile(spec, data_col, None, data_schema)
