"""Compiled pipeline vs interpreter equivalence (the two execution
paths must agree on the wire)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from vanus_spark.plans import CompileFallback, compile_pipeline
from vanus_spark.subscription import Subscription
from vanus_spark.transformer import transform_dataframe

DATA_SCHEMA = "user_id long, value double, props struct<k: int>"


def _parse(rows):
    return {r.id: json.loads(r.data) for r in rows}


def both_paths(cloudevents, pipeline):
    df = cloudevents.limit(300)
    compiled = compile_pipeline(pipeline, DATA_SCHEMA)(df)
    interp = transform_dataframe(df, {"pipeline": pipeline})
    return _parse(compiled.collect()), _parse(interp.collect())


@pytest.mark.parametrize(
    "pipeline",
    [
        [["MATH_MUL", "$.data.value", "$.data.value", 100]],
        [["MATH_ADD", "$.data.total", "$.data.value", "$.data.props.k", 1]],
        [["MATH_DIV", "$.data.r", "$.data.value", "$.data.props.k"]],  # k=0 -> skip
        [["CREATE", "$.data.tag", "x"], ["CREATE", "$.data.tag", "y"]],
        [["DUPLICATE", "$.data.user_id", "$.data.uid2"], ["DELETE", "$.data.user_id"]],
        [["RENAME", "$.data.props", "$.data.p"]],
        [["CONDITION_IF", "$.data.flag", "$.data.value", ">=", 100, "hi", "lo"]],
        [["LENGTH", "$.data.n", "$.data.props"]],
        [
            ["CREATE", "$.data.s", "hello world"],
            ["UPPER_CASE", "$.data.s"],
            ["ADD_PREFIX", "$.data.s", ">>"],
            ["REPLACE_STRING", "$.data.s", "L", "_"],
            ["CAPITALIZE_WORD", "$.data.s"],
        ],
        [
            ["CREATE", "$.data.s", "a[inner]b"],
            ["EXTRACT_BETWEEN_DELIMITERS", "$.data.s", "$.data.mid", "[", "]"],
            ["EXTRACT_BETWEEN_POSITIONS", "$.data.s", "$.data.pos", 2, 4],
            ["CHECK_CUSTOM_VALUES", "$.data.s", "inner", "$.data.has", "Y", "N"],
        ],
        [["SPLIT_WITH_DELIMITER", "$.data.s", ",", "$.data.parts"]],  # s unknown -> skipped both
    ],
)
def test_compiled_matches_interpreter(cloudevents, pipeline):
    try:
        compiled, interp = both_paths(cloudevents, pipeline)
    except CompileFallback:
        pytest.fail(f"pipeline unexpectedly not compilable: {pipeline}")
    assert compiled == interp


def test_fallback_on_dynamic_paths(cloudevents):
    with pytest.raises(CompileFallback):
        compile_pipeline([["UNFOLD_ARRAY", "$.data.arr", "$.data.item"]], DATA_SCHEMA)
    with pytest.raises(CompileFallback):
        compile_pipeline([["CREATE", "$.data.a[0]", 1]], DATA_SCHEMA)


def test_subscription_uses_compiled_path(cloudevents):
    sub = Subscription.from_spec(
        {
            "filters": [{"exact": {"type": "purchase"}}],
            "transformer": {"pipeline": [["MATH_MUL", "$.data.value", "$.data.value", 100]]},
        }
    )
    out = sub.apply(cloudevents, data_schema=DATA_SCHEMA)
    # compiled plans have no Python eval nodes
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "EvalPython" not in plan
    r = out.limit(1).collect()[0]
    assert json.loads(r.data)["value"] == pytest.approx(
        float(json.loads(cloudevents.where("type='purchase'").limit(1).collect()[0].data)["value"]) * 100
    )


def test_subscription_falls_back_for_template(cloudevents):
    sub = Subscription.from_spec(
        {"transformer": {"pipeline": [["MATH_MUL", "$.data.value", "$.data.value", 2]],
                         "template": "v=<$.data.value>"}}
    )
    out = sub.apply(cloudevents.limit(5), data_schema=DATA_SCHEMA)
    assert out.collect()[0].data.startswith("v=")
