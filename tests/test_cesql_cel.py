"""Translator unit coverage: CESQL v1 operator surface + CEL subset."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vanus_spark.cel import cel_to_column, extract_variables
from vanus_spark.cesql import cesql_expr_column, cesql_to_column, tokenize
from vanus_spark.transformer import Transformer


@pytest.fixture(scope="module")
def one(spark, cloudevents):
    return cloudevents.limit(200).cache()


def n_match(df, expr):
    return df.where(F.coalesce(cesql_to_column(expr), F.lit(False))).count()


def test_cesql_xor(one):
    a = n_match(one, "type = 'purchase' XOR type LIKE 'p%'")
    assert a == 0  # both true or both false everywhere
    b = n_match(one, "type = 'purchase' XOR TRUE")
    assert b == one.count() - one.where("type = 'purchase'").count()


def test_cesql_not_like_not_in(one):
    assert n_match(one, "type NOT LIKE 'p%'") == one.where(~F.col("type").like("p%")).count()
    assert n_match(one, "type NOT IN ('error', 'view')") == one.where(
        ~F.col("type").isin("error", "view")
    ).count()


def test_cesql_arith_precedence(one):
    # 2 + 3 * 4 = 14, not 20
    assert n_match(one, "2 + 3 * 4 = 14") == one.count()
    assert n_match(one, "(2 + 3) * 4 = 20") == one.count()
    assert n_match(one, "10 % 3 = 1") == one.count()
    assert n_match(one, "-5 + 10 = 5") == one.count()


def test_cesql_string_functions(one):
    r = one.select(
        cesql_expr_column("CONCAT(UPPER(LEFT(type,1)), LOWER(RIGHT(type,2)))").alias("x"),
        "type",
    ).first()
    assert r.x == r.type[0].upper() + r.type[-2:].lower()
    assert n_match(one, "TRIM(' a ') = 'a'") == one.count()
    assert n_match(one, "SUBSTRING(type, 1, 2) = LEFT(type, 2)") == one.count()
    assert n_match(one, "LENGTH(CONCAT(type, 'x')) = LENGTH(type) + 1") == one.count()


def test_cesql_type_functions(one):
    assert n_match(one, "IS_INT(partitionkey)") == one.count()
    assert n_match(one, "IS_INT(type)") == 0
    assert n_match(one, "INT(partitionkey) >= 0") == one.count()
    assert n_match(one, "ABS(0 - 5) = 5") == one.count()
    assert n_match(one, "BOOL('true')") == one.count()
    assert n_match(one, "STRING(1) = '1'") == one.count()


def test_cesql_escaped_quote():
    toks = tokenize("type = 'it''s'")
    assert toks[-1].text == "'it''s'"


def test_cel_variable_extraction():
    expr, variables = extract_variables('$a.b.(int64) > 10 && $c.(string) == "x"')
    assert "vanus_a_b" in expr and "vanus_c" in expr
    assert variables["vanus_a_b"] == ("$.a.b", "long")
    assert variables["vanus_c"] == ("$.c", "string")


def test_cel_bad_type_rejected():
    with pytest.raises(ValueError):
        extract_variables("$a.(float32) > 1")


def test_cel_string_and_bool_vars(one):
    n = one.where(
        F.coalesce(cel_to_column('$user_id.(string) == "12"'), F.lit(False))
    ).count()
    expected = one.where(F.get_json_object("data", "$.user_id") == "12").count()
    assert n == expected


def test_cel_negation_and_or(one):
    got = one.where(
        F.coalesce(
            cel_to_column("!($user_id.(int64) > 10) || $value.(double) > 150.0"),
            F.lit(False),
        )
    ).count()
    expected = one.where(
        (~(F.get_json_object("data", "$.user_id").cast("long") > 10))
        | (F.get_json_object("data", "$.value").cast("double") > 150.0)
    ).count()
    assert got == expected


def test_transformer_skips_unparseable_action():
    tf = Transformer({"pipeline": [["NO_SUCH_ACTION", "$.data.x"], ["CREATE", "$.data.y", 1]]})
    assert len(tf.actions) == 1 and len(tf.parse_errors) == 1
    _, data, err = tf.execute_event({"id": "1"}, "{}")
    assert not err and '"y":1' in data.replace(" ", "")
