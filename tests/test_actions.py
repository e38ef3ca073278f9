"""Golden tests for the 38-action interpreter (values derived from the
reference's unit tests — e.g. date_format_test.go:19-45)."""

from __future__ import annotations

import pytest

from vanus_spark.actions.interp import EventContext, build_action, run_pipeline
from vanus_spark.casts import py_cast


def run(commands, data=None, attrs=None):
    ctx = EventContext(attrs=attrs or {}, data=data if data is not None else {})
    errs = run_pipeline([build_action(c) for c in commands], ctx)
    return ctx, errs


# --- structs ---------------------------------------------------------------

def test_create_delete_replace():
    ctx, errs = run([["CREATE", "$.data.a", 1]], data={})
    assert ctx.data == {"a": 1} and not errs
    # create on existing key -> error, skipped
    ctx, errs = run([["CREATE", "$.data.a", 2]], data={"a": 1})
    assert ctx.data == {"a": 1} and errs
    # replace on missing key -> error, skipped
    ctx, errs = run([["REPLACE", "$.data.b", 2]], data={"a": 1})
    assert ctx.data == {"a": 1} and errs
    ctx, errs = run([["REPLACE", "$.data.a", 2]], data={"a": 1})
    assert ctx.data == {"a": 2} and not errs
    ctx, errs = run([["DELETE", "$.data.a"]], data={"a": 1, "b": 2})
    assert ctx.data == {"b": 2} and not errs


def test_move_rename_duplicate():
    ctx, _ = run([["MOVE", "$.data.user_id", "$.data.uid"]], data={"user_id": 7})
    assert ctx.data == {"uid": 7}
    ctx, _ = run([["RENAME", "$.data.x", "$.data.y"]], data={"x": "v"})
    assert ctx.data == {"y": "v"}
    ctx, _ = run([["DUPLICATE", "$.data.x", "$.data.y"]], data={"x": "v"})
    assert ctx.data == {"x": "v", "y": "v"}
    # dest exists -> error, skipped
    ctx, errs = run([["MOVE", "$.data.x", "$.data.y"]], data={"x": 1, "y": 2})
    assert ctx.data == {"x": 1, "y": 2} and errs


def test_nested_create():
    ctx, errs = run([["CREATE", "$.data.a.b.c", 5]], data={})
    assert ctx.data == {"a": {"b": {"c": 5}}} and not errs


# --- math ------------------------------------------------------------------

def test_math():
    ctx, _ = run([["MATH_ADD", "$.data.total", 1, 2, 3]], data={})
    assert ctx.data["total"] == 6.0
    ctx, _ = run([["MATH_SUB", "$.data.r", 10, "4"]], data={})
    assert ctx.data["r"] == 6.0
    ctx, _ = run([["MATH_MUL", "$.data.r", 2, 3, "4"]], data={})
    assert ctx.data["r"] == 24.0
    ctx, _ = run([["MATH_DIV", "$.data.r", 10, 4]], data={})
    assert ctx.data["r"] == 2.5
    # div by zero -> action skipped, event unchanged
    ctx, errs = run([["MATH_DIV", "$.data.r", 10, 0]], data={"q": 1})
    assert "r" not in ctx.data and errs
    # variadic add from data paths
    ctx, _ = run([["MATH_ADD", "$.data.t", "$.data.a", "$.data.b"]], data={"a": 1, "b": "2.5"})
    assert ctx.data["t"] == 3.5


# --- datetime (date_format_test.go:19-45) ---------------------------------

def test_date_format():
    data = {"t": "2022-11-15T15:41:25Z"}
    ctx, errs = run([["DATE_FORMAT", "$.data.t", "Y-m-d H:i:s"]], data=dict(data))
    assert not errs and ctx.data["t"] == "2022-11-15 15:41:25"
    ctx, errs = run([["DATE_FORMAT", "$.data.t", "Y-m-d H:i:s", "EST"]], data=dict(data))
    assert not errs and ctx.data["t"] == "2022-11-15 10:41:25"


def test_unix_time_format():
    ctx, errs = run([["UNIX_TIME_FORMAT", "$.data.t", "Y-m-d H:i:s"]], data={"t": 1668526885})
    assert not errs and ctx.data["t"] == "2022-11-15 15:41:25"


def test_convert_timezone():
    ctx, errs = run(
        [["CONVERT_TIMEZONE", "$.data.t", "UTC", "EST"]],
        data={"t": "2022-11-15 15:41:25"},
    )
    assert not errs and ctx.data["t"] == "2022-11-15 10:41:25"


# --- strings ---------------------------------------------------------------

def test_case_actions():
    ctx, _ = run([["UPPER_CASE", "$.data.s"]], data={"s": "abc"})
    assert ctx.data["s"] == "ABC"
    ctx, _ = run([["LOWER_CASE", "$.data.s"]], data={"s": "AbC"})
    assert ctx.data["s"] == "abc"
    ctx, _ = run([["CAPITALIZE_SENTENCE", "$.data.s"]], data={"s": "hello world"})
    assert ctx.data["s"] == "Hello world"
    ctx, _ = run([["CAPITALIZE_WORD", "$.data.s"]], data={"s": "hello wORld"})
    assert ctx.data["s"] == "Hello WORld"


def test_prefix_suffix_join():
    ctx, _ = run([["ADD_PREFIX", "$.data.s", "pre-"]], data={"s": "x"})
    assert ctx.data["s"] == "pre-x"
    ctx, _ = run([["ADD_SUFFIX", "$.data.s", "-post"]], data={"s": "x"})
    assert ctx.data["s"] == "x-post"
    ctx, _ = run(
        [["JOIN", "$.data.j", ",", "$.data.a", "$.data.b"]],
        data={"a": ["1", "2"], "b": ["3"]},
    )
    assert ctx.data["j"] == "1,2,3"


def test_splits():
    ctx, _ = run([["SPLIT_WITH_DELIMITER", "$.data.s", ",", "$.data.parts"]], data={"s": "a,b,c"})
    assert ctx.data["parts"] == ["a", "b", "c"]
    ctx, _ = run([["SPLIT_FROM_START", "$.data.s", 2, "$.data.p"]], data={"s": "abcdef"})
    assert ctx.data["p"] == ["ab", "cdef"]
    ctx, _ = run([["SPLIT_BETWEEN_POSITIONS", "$.data.s", 1, 3, "$.data.p"]], data={"s": "abcdef"})
    assert ctx.data["p"] == ["a", "bc", "def"]
    ctx, _ = run([["SPLIT_WITH_INTERVALS", "$.data.s", 1, 2, "$.data.p"]], data={"s": "abcdef"})
    assert ctx.data["p"] == ["a", "bc", "de", "f"]
    # target exists -> skip
    ctx, errs = run(
        [["SPLIT_BETWEEN_POSITIONS", "$.data.s", 1, 3, "$.data.p"]],
        data={"s": "abcdef", "p": 1},
    )
    assert ctx.data["p"] == 1 and errs


def test_replaces():
    ctx, _ = run([["REPLACE_STRING", "$.data.s", "b", "X"]], data={"s": "abcb"})
    assert ctx.data["s"] == "aXcX"
    ctx, _ = run([["REPLACE_WITH_REGEX", "$.data.s", "[0-9]+", "N"]], data={"s": "a12b3"})
    assert ctx.data["s"] == "aNbN"
    ctx, _ = run([["REPLACE_BETWEEN_POSITIONS", "$.data.s", 1, 3, "X"]], data={"s": "abcdef"})
    assert ctx.data["s"] == "aXdef"
    ctx, _ = run(
        [["REPLACE_BETWEEN_DELIMITERS", "$.data.s", "[", "]", "X"]], data={"s": "a[bc]d"}
    )
    assert ctx.data["s"] == "aXd"


def test_extracts():
    ctx, _ = run(
        [["EXTRACT_BETWEEN_DELIMITERS", "$.data.s", "$.data.o", "[", "]"]],
        data={"s": "a[bc]d"},
    )
    assert ctx.data["o"] == "bc"
    ctx, _ = run(
        [["EXTRACT_BETWEEN_POSITIONS", "$.data.s", "$.data.o", 2, 4]], data={"s": "abcdef"}
    )
    assert ctx.data["o"] == "bcd"
    ctx, _ = run(
        [["EXTRACT_MISSING_ACTION", "$.data.s", "$.data.o", "EMPTY", "FULL"]],
        data={"s": ""},
    )
    assert ctx.data["o"] == "EMPTY"
    ctx, _ = run(
        [["CHECK_CUSTOM_VALUES", "$.data.s", "bc", "$.data.o", "YES", "NO"]],
        data={"s": "abcd"},
    )
    assert ctx.data["o"] == "YES"


# --- condition / length ----------------------------------------------------

def test_condition_if():
    ctx, _ = run(
        [["CONDITION_IF", "$.data.flag", "$.data.v", ">=", 100, "hi", "lo"]],
        data={"v": 150},
    )
    assert ctx.data["flag"] == "hi"
    ctx, _ = run(
        [["CONDITION_IF", "$.data.flag", "$.data.v", "==", "abc", "Y", "N"]],
        data={"v": "abc"},
    )
    assert ctx.data["flag"] == "Y"


def test_length():
    ctx, _ = run([["LENGTH", "$.data.n", "$.data.s"]], data={"s": "hello"})
    assert ctx.data["n"] == 5
    ctx, _ = run([["LENGTH", "$.data.n", "$.data.a"]], data={"a": [1, 2, 3]})
    assert ctx.data["n"] == 3


# --- array -----------------------------------------------------------------

def test_unfold_array():
    ctx, errs = run([["UNFOLD_ARRAY", "$.data.arr", "$.data.item"]], data={"arr": ["x", "y"]})
    assert ctx.data["item-0"] == "x" and ctx.data["item-1"] == "y" and not errs


def test_array_foreach_nested():
    ctx, errs = run(
        [["ARRAY_FOREACH", "$.data.users", ["UPPER_CASE", "$.data.name"]]],
        data={"users": [{"name": "ann"}, {"name": "bob"}]},
    )
    assert not errs
    assert [u["name"] for u in ctx.data["users"]] == ["ANN", "BOB"]


def test_render_array():
    ctx, errs = run(
        [["RENDER_ARRAY", "$.data.out", "$.data.users", "name=<@.name>!"]],
        data={"users": [{"name": "a"}, {"name": "b"}]},
    )
    assert not errs
    assert ctx.data["out"] == ["name=a!", "name=b!"]


# --- attributes ------------------------------------------------------------

def test_attribute_ops():
    ctx, _ = run([["CREATE", "$.newattr", "v1"]], attrs={"type": "t"})
    assert ctx.attrs["newattr"] == "v1"
    ctx, _ = run([["UPPER_CASE", "$.type"]], attrs={"type": "abc"})
    assert ctx.attrs["type"] == "ABC"


# --- pipeline error semantics ---------------------------------------------

def test_pipeline_continues_after_error():
    ctx, errs = run(
        [
            ["MATH_DIV", "$.data.bad", 1, 0],   # skipped
            ["CREATE", "$.data.ok", "yes"],     # still runs
        ],
        data={},
    )
    assert len(errs) == 1 and ctx.data == {"ok": "yes"}


def test_later_actions_see_earlier_writes():
    ctx, errs = run(
        [
            ["CREATE", "$.data.a", "x"],
            ["ADD_SUFFIX", "$.data.a", "y"],
        ],
        data={},
    )
    assert ctx.data["a"] == "xy" and not errs


# --- casts -----------------------------------------------------------------

def test_cast_lattice():
    assert py_cast("12", "int") == 12
    assert py_cast(12.9, "int") == 12
    assert py_cast({"a": 1}, "string") == '{"a":1}'
    assert py_cast("x", "string_array") == ["x"]
    assert py_cast(6.0, "string") == "6"
    assert py_cast(6.5, "string") == "6.5"
    assert py_cast("true", "bool") is True
    with pytest.raises(Exception):
        py_cast("12.5", "int")
