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


# ---------------------------------------------------------------------------
# schema-free payloads: sample-inferred schema (schema_infer.py)
# ---------------------------------------------------------------------------


def _hetero_payloads(spark):
    """Deterministic heterogeneous payloads: some rows lack metrics,
    some lack tags, types vary per field — the schema-free shape."""
    rows = []
    for i in range(60):
        parts = [f'"user_id": {i}']
        if i % 3 != 0:
            parts.append(f'"metrics": {{"clicks": {i % 7}, "score": {i / 4}}}')
        if i % 2 == 0:
            parts.append(f'"tags": ["t{i % 5}", "x"]')
        rows.append((i, "{" + ", ".join(parts) + "}"))
    return spark.createDataFrame(rows, "id long, data string")


def test_infer_data_schema_and_resolution(spark):
    from pyspark.sql.types import ArrayType, StructType

    from vanus_spark.schema_infer import infer_data_schema, resolve_json_path

    df = _hetero_payloads(spark)
    schema = infer_data_schema(df)
    assert isinstance(schema, StructType)
    assert set(schema.fieldNames()) == {"user_id", "metrics", "tags"}
    assert isinstance(schema["tags"].dataType, ArrayType)
    ref, leaf = resolve_json_path(schema, "$.metrics.clicks")
    assert ref == ".`metrics`.`clicks`" and leaf.typeName() == "long"
    ref, leaf = resolve_json_path(schema, "$.tags[1]")
    assert ref == ".`tags`[1]" and leaf.typeName() == "string"
    assert resolve_json_path(schema, "$.missing") is None
    assert resolve_json_path(schema, "$.metrics") is None  # interior object
    assert resolve_json_path(schema, "$.user_id[0]") is None  # not an array


def test_infer_data_schema_unparseable_returns_none(spark):
    from vanus_spark.schema_infer import infer_data_schema

    junk = spark.createDataFrame(
        [(1, "not json at all"), (2, "{broken")], "id long, data string"
    )
    assert infer_data_schema(junk) is None


def test_cel_dynamic_schema_single_parse_matches_fallback(spark):
    """A CEL spec with an array-indexed path over a SCHEMA-FREE payload:
    with an inferred schema the whole predicate binds ONE from_json
    (no get_json_object anywhere); without it, the per-path fallback —
    and both routes select the identical rows."""
    from vanus_spark.schema_infer import infer_data_schema

    df = _hetero_payloads(spark)
    spec = {
        "cel": '$metrics.clicks.(int64) >= 3 && $tags[0].(string) == "t2" '
        "&& $user_id.(int64) < 50"
    }
    schema = infer_data_schema(df)
    bound = df.where(compile_filter(spec, data_schema=schema))
    plan = _plan(bound)
    assert plan.count("from_json") == 1
    assert "get_json_object" not in plan
    fallback = df.where(compile_filter(spec))
    assert "get_json_object" in _plan(fallback)  # the N-parse shape
    got = {r.id for r in bound.collect()}
    assert got == {r.id for r in fallback.collect()}
    expected = {
        i
        for i in range(60)
        if i % 3 != 0 and i % 7 >= 3 and i % 2 == 0 and i % 5 == 2 and i < 50
    }
    assert got == expected and got


def test_dynamic_schema_coercion_matches_get_json_object(spark):
    """The inferred-schema route must coerce through STRING: a double
    leaf declared int64 fails (NULL) exactly like try_cast of the
    get_json_object text — never a truncating numeric cast."""
    from vanus_spark.schema_infer import infer_data_schema

    df = spark.createDataFrame(
        [(1, '{"a": 12.5, "b": 1}'), (2, '{"a": 3, "b": 2}')],
        "id long, data string",
    )
    spec = {"cel": "$a.(int64) >= 1 && $b.(int64) >= 1"}
    schema = infer_data_schema(df)
    got = {r.id for r in df.where(compile_filter(spec, data_schema=schema)).collect()}
    want = {r.id for r in df.where(compile_filter(spec)).collect()}
    assert got == want == {2}  # 12.5 under int64 fails, never truncates to 12


def test_exact_prefix_consolidate_under_inferred_schema(spark):
    """exact/prefix over data paths INCLUDING an array index share the
    single inferred-schema parse and match the per-path semantics."""
    from vanus_spark.schema_infer import infer_data_schema

    df = _hetero_payloads(spark)
    spec = {
        "all": [
            {"exact": {"data.tags[0]": "t2"}},
            {"prefix": {"data.metrics.clicks": "4"}},
        ]
    }
    schema = infer_data_schema(df)
    bound = df.where(compile_filter(spec, data_schema=schema))
    plan = _plan(bound)
    assert plan.count("from_json") == 1 and "get_json_object" not in plan
    got = {r.id for r in bound.collect()}
    assert got == {r.id for r in df.where(compile_filter(spec)).collect()}
    expected = {
        i for i in range(60) if i % 2 == 0 and i % 5 == 2 and i % 3 != 0 and i % 7 == 4
    }
    assert got == expected and got


def test_cel_ternary_operator(spark):
    """CEL ?: compiles to a NULL-propagating CASE: right-associative
    chains, ?/: inside string literals, nesting under comparisons, and
    — critically — a failed extraction in the CONDITION fails the
    whole filter instead of silently taking the else branch."""
    df = spark.createDataFrame(
        [(1, '{"a": 5, "s": "x"}'), (2, '{"a": -1, "s": "y"}'), (3, '{"s": "x"}')],
        "id long, data string",
    )
    cases = [
        ('($a.(int64) > 0 ? "hi" : "lo") == "hi"', {1}),
        # right-assoc chain; doc 3 (no "a") must FAIL, not fall to "neg"
        ('($a.(int64) > 3 ? "big" : $a.(int64) > 0 ? "mid" : "neg") == "neg"', {2}),
        ('($s.(string) == "x" ? "q?:mark" : "none") == "q?:mark"', {1, 3}),
        ('(($a.(int64) > 0 ? $s.(string) : "z") == "x") && $a.(int64) != 0', {1}),
    ]
    for expr, want in cases:
        got = {r.id for r in df.where(compile_filter({"cel": expr})).collect()}
        assert got == want, expr


def test_cesql_nonboolean_logical_operand_fails_filter_not_job(spark):
    """Regression (r5): an attr as a bare OR/XOR operand went through
    an ANSI implicit string->boolean cast, ABORTING the job on the
    first malformed value; it must instead null out (filter fails)."""
    from vanus_spark.cesql import cesql_to_column

    df = spark.createDataFrame(
        [("true", "1"), ("false", "0"), ("purchase", "x")],
        "type string, subject string",
    ).withColumn("attributes", F.create_map().cast("map<string,string>"))
    expect = {
        "TRUE OR type": [True, True, True],
        "FALSE OR type": [True, False, False],
        "type OR subject": [True, False, False],
        "type XOR subject": [False, False, False],
        "type AND TRUE": [True, False, False],
    }
    for expr, want in expect.items():
        got = [
            r.r
            for r in df.select(
                F.coalesce(cesql_to_column(expr), F.lit(False)).alias("r")
            ).collect()
        ]
        assert got == want, expr
