"""Static-pipeline compiler: transformer pipeline -> pure Column plan.

When the subscription declares a payload schema and every action
addresses static ``$.data.x[.y]`` paths, the whole pipeline compiles
to ONE ``select`` over a struct-typed data column — whole-stage
codegen, no Python at eval time. Anything outside the compilable
subset raises ``CompileFallback`` and the caller uses the interpreter
(transformer.py), which is always exact.

Semantics preserved from the reference:
- skip-on-error: an action whose computation NULLs out (bad cast,
  div-by-zero, bounds) keeps the OLD field value via
  ``coalesce(new, old)`` (pipeline/pipeline.go:41-52);
- CREATE requires target absent (runtime null), REPLACE requires it
  present (structs/*.go) — compiled as conditional field writes;
- MOVE/RENAME/DUPLICATE compile only when the destination is not in
  the schema (then the exists-check statically passes); otherwise
  fallback — the conditional drop isn't expressible per-row;
- absent-vs-null: ``to_json`` omits null fields by default, matching
  the interpreter's absent keys on the wire.

Compilable actions: CREATE REPLACE DELETE MOVE RENAME DUPLICATE,
MATH_ADD/SUB/MUL/DIV, UPPER/LOWER_CASE, ADD_PREFIX/SUFFIX,
CAPITALIZE_SENTENCE/WORD, REPLACE_STRING, REPLACE_WITH_REGEX,
CONDITION_IF, LENGTH, DATE_FORMAT, UNIX_TIME_FORMAT,
CONVERT_TIMEZONE, SPLIT_WITH_DELIMITER, EXTRACT_BETWEEN_DELIMITERS,
EXTRACT_BETWEEN_POSITIONS, CHECK_CUSTOM_VALUES, EXTRACT_MISSING.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame, functions as F, types as T

from vanus_spark.functions import scalars as vf


class CompileFallback(Exception):
    """Pipeline not statically compilable — use the interpreter."""


class _UnknownRead(Exception):
    """Action reads a path that can never exist — the action always
    errors at runtime, so it compiles to a statically-skipped no-op
    (reference: RunArgs error => skip, pipeline.go:41-52)."""


def _is_data_path(arg: Any) -> bool:
    return isinstance(arg, str) and (arg == "$.data" or arg.startswith("$.data."))


def _path_of(arg: str) -> str:
    p = arg[7:]  # strip "$.data."
    if not p or "[" in p or "*" in p:
        raise CompileFallback(f"dynamic path {arg}")
    return p


def _schema_field(schema: T.StructType, path: str) -> T.DataType | None:
    cur: T.DataType = schema
    for part in path.split("."):
        if not isinstance(cur, T.StructType) or part not in cur.fieldNames():
            return None
        cur = cur[part].dataType
    return cur


class _State:
    """Tracks the evolving data struct column + the set of paths known
    to exist (schema fields + compiled CREATEs)."""

    def __init__(self, data: Column, schema: T.StructType):
        self.data = data
        self.schema = schema
        self.created: set[str] = set()

    def in_schema(self, path: str) -> bool:
        return _schema_field(self.schema, path) is not None

    def known(self, path: str) -> bool:
        return self.in_schema(path) or path in self.created

    def get(self, path: str) -> Column:
        if not self.known(path):
            raise _UnknownRead(path)
        c = self.data
        for part in path.split("."):
            c = c.getField(part)
        return c

    def set(self, path: str, value: Column) -> None:
        self.data = self.data.withField(path, value)
        self.created.add(path)

    def drop(self, path: str) -> None:
        self.data = self.data.dropFields(path)
        self.created.discard(path)


def _value_arg(state: _State, arg: Any) -> Column:
    """Resolve a source arg: data path, constant, or attribute."""
    if _is_data_path(arg):
        return state.get(_path_of(arg))
    if isinstance(arg, str) and arg.startswith("$.") and not arg.startswith("$.data"):
        from vanus_spark.model import attribute_column

        return attribute_column(arg[2:].lower())
    if isinstance(arg, str) and arg.startswith("@."):
        return state.get(arg[2:])
    return F.lit(arg)


def _num(state: _State, arg: Any) -> Column:
    return _value_arg(state, arg).cast("string").try_cast("double")


def _skip_on_null(state: _State, path: str, new: Column) -> Column:
    """error => keep old (or stay absent if never set)."""
    if state.known(path):
        return F.coalesce(new, state.get(path))
    return new


def compile_pipeline(
    pipeline: list[list[Any]], data_schema: T.StructType | str
) -> Callable[[DataFrame], DataFrame]:
    """Returns df -> df with ``data`` (JSON string) rewritten by the
    compiled pipeline. Raises CompileFallback when not compilable."""
    schema = (
        T._parse_datatype_string(data_schema)  # noqa: SLF001
        if isinstance(data_schema, str)
        else data_schema
    )
    if not isinstance(schema, T.StructType):
        raise CompileFallback("data schema must be a struct")

    def apply(df: DataFrame) -> DataFrame:
        state = _State(F.from_json(F.col("data"), schema), schema)
        for cmd in pipeline:
            try:
                _compile_action(state, cmd)
            except _UnknownRead:
                continue  # action can never succeed -> statically skipped
        return df.withColumn("data", F.to_json(state.data))

    # dry-compile against an empty state to surface fallbacks eagerly
    probe = _State(F.from_json(F.lit("{}"), schema), schema)
    for cmd in pipeline:
        try:
            _compile_action(probe, cmd)
        except _UnknownRead:
            continue
    return apply


def _compile_action(state: _State, cmd: list[Any]) -> None:  # noqa: PLR0912, PLR0915
    name = str(cmd[0]).upper()
    args = cmd[1:]

    if name == "CREATE":
        if not _is_data_path(args[0]):
            raise CompileFallback("CREATE on non-data target")
        path = _path_of(args[0])
        val = _value_arg(state, args[1])
        if state.known(path):
            # runtime exists-check: only write where currently null
            state.set(path, F.coalesce(state.get(path), val))
        else:
            state.set(path, val)
        return
    if name == "REPLACE":
        path = _path_of(args[0])
        if not state.known(path):
            return  # target never exists -> always skipped
        old = state.get(path)
        state.set(path, F.when(old.isNotNull(), _value_arg(state, args[1])).otherwise(old))
        return
    if name == "DELETE":
        path = _path_of(args[0])
        if state.known(path):
            state.drop(path)
        return
    if name in ("MOVE", "RENAME", "DUPLICATE"):
        src, dst = _path_of(args[0]), _path_of(args[1])
        if state.known(dst):
            raise CompileFallback(f"{name} destination {dst} may exist at runtime")
        state.set(dst, state.get(src))
        if name in ("MOVE", "RENAME"):
            state.drop(src)
        return

    if name in ("MATH_ADD", "MATH_SUB", "MATH_MUL", "MATH_DIV"):
        path = _path_of(args[0])
        nums = [_num(state, a) for a in args[1:]]
        if name == "MATH_ADD":
            new = vf.math_add(*nums)
        elif name == "MATH_SUB":
            new = vf.math_sub(*nums)
        elif name == "MATH_MUL":
            new = vf.math_mul(*nums)
        else:
            new = vf.math_div(*nums)
        state.set(path, _skip_on_null(state, path, new))
        return

    in_place_str = {
        "UPPER_CASE": lambda c, a: F.upper(c),
        "LOWER_CASE": lambda c, a: F.lower(c),
        "CAPITALIZE_SENTENCE": lambda c, a: vf.capitalize_sentence(c),
        "CAPITALIZE_WORD": lambda c, a: vf.capitalize_word(c),
        "ADD_PREFIX": lambda c, a: vf.add_prefix(c, str(a[0])),
        "ADD_SUFFIX": lambda c, a: vf.add_suffix(c, str(a[0])),
        "REPLACE_STRING": lambda c, a: vf.replace_string(c, str(a[0]), str(a[1])),
        "REPLACE_WITH_REGEX": lambda c, a: vf.replace_with_regex(c, str(a[0]), str(a[1])),
        "REPLACE_BETWEEN_POSITIONS": lambda c, a: vf.replace_between_positions(
            c, int(a[0]), int(a[1]), str(a[2])
        ),
        "REPLACE_BETWEEN_DELIMITERS": lambda c, a: vf.replace_between_delimiters(
            c, str(a[0]), str(a[1]), str(a[2])
        ),
        "DATE_FORMAT": lambda c, a: vf.date_format_php(
            F.to_timestamp(c), str(a[0]), str(a[1]) if len(a) > 1 else None
        ),
        "UNIX_TIME_FORMAT": lambda c, a: vf.unix_time_format(
            c.cast("string").try_cast("long"), str(a[0]), str(a[1]) if len(a) > 1 else None
        ),
        "CONVERT_TIMEZONE": lambda c, a: vf.convert_timezone(
            c, str(a[0]), str(a[1]), str(a[2]) if len(a) > 2 else "Y-m-d H:i:s"
        ),
    }
    if name in in_place_str:
        path = _path_of(args[0])
        old = state.get(path).cast("string")
        state.set(path, _skip_on_null(state, path, in_place_str[name](old, args[1:])))
        return

    if name == "CONDITION_IF":
        path = _path_of(args[0])
        new = vf.condition_if(
            _value_arg(state, args[1]),
            str(args[2]),
            _value_arg(state, args[3]),
            _value_arg(state, args[4]),
            _value_arg(state, args[5]),
        )
        state.set(path, _skip_on_null(state, path, new))
        return
    if name == "LENGTH":
        path = _path_of(args[0])
        src_path = _path_of(args[1]) if _is_data_path(args[1]) else None
        if src_path is None:
            raise CompileFallback("LENGTH of non-data arg")
        dtype = _schema_field(state.schema, src_path)
        src = state.get(src_path)
        if isinstance(dtype, (T.ArrayType, T.MapType)):
            new = F.size(src).cast("long")
        elif isinstance(dtype, T.StructType):
            # map length = number of present (non-null) keys
            present = [
                F.when(src.getField(f.name).isNotNull(), 1).otherwise(0)
                for f in dtype.fields
            ]
            total = present[0]
            for p in present[1:]:
                total = total + p
            new = F.when(src.isNotNull(), total.cast("long"))
        else:
            new = F.length(src.cast("string")).cast("long")
        state.set(path, _skip_on_null(state, path, new))
        return
    if name == "SPLIT_WITH_DELIMITER":
        src = state.get(_path_of(args[0])).cast("string")
        target = _path_of(args[2])
        state.set(target, vf.split_literal(src, str(args[1])))
        return
    if name == "EXTRACT_BETWEEN_DELIMITERS":
        src = state.get(_path_of(args[0])).cast("string")
        target = _path_of(args[1])
        state.set(
            target,
            _skip_on_null(
                state, target, vf.extract_between_delimiters(src, str(args[2]), str(args[3]))
            ),
        )
        return
    if name == "EXTRACT_BETWEEN_POSITIONS":
        src = state.get(_path_of(args[0])).cast("string")
        target = _path_of(args[1])
        state.set(
            target,
            _skip_on_null(
                state, target, vf.extract_between_positions(src, int(args[2]), int(args[3]))
            ),
        )
        return
    if name == "CHECK_CUSTOM_VALUES":
        src = state.get(_path_of(args[0])).cast("string")
        target = _path_of(args[2])
        state.set(
            target,
            vf.check_custom_values(
                src, str(args[1]), _value_arg(state, args[3]), _value_arg(state, args[4])
            ),
        )
        return
    if name in ("EXTRACT_MISSING", "EXTRACT_MISSING_ACTION"):
        src = state.get(_path_of(args[0])).cast("string")
        target = _path_of(args[1])
        state.set(target, vf.extract_missing(src, str(args[2]), str(args[3])))
        return

    raise CompileFallback(f"action {name} not compilable")
