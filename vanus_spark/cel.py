"""CEL-filter subset -> Spark Column translator.

The reference's CEL filter declares typed JSONPath variables inline —
``$a.b.(int64) > 10`` — extracts them by string scan, renames them
``vanus_a_b``, builds a CEL program that must return bool, and per
event: JSONPath-extract -> coerce to declared type -> eval
(reference: pkg/cel/cel.go:44-101 parse, 103-147 program/5 types,
149-204 eval, 206-275 coercions; server/trigger/filter/cel_filter.go:
29-55).

The operator subset reachable through those 5 scalar types
(comparisons, arithmetic, && || !, string relations, ?:) is exactly
Spark-SQL-expressible, so the translation is:
  ``$path.(T)``  ->  CAST(get_json_object(data, '$.path') AS T)
then a syntax rewrite of the remaining CEL into a Spark SQL predicate
(`&&`->AND, `||`->OR, `==`->=, `!x`->NOT x, "str"->'str').
Extraction/coercion failure fails the filter (caller coalesces false).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

_CEL_TYPES = {
    "string": "string",
    "int64": "long",
    "uint64": "long",
    "bool": "boolean",
    "double": "double",
}

_VAR_RE = re.compile(r"\$([A-Za-z0-9_.\[\]]+)\.\(([a-z0-9]+)\)")


def extract_variables(expression: str) -> tuple[str, dict[str, tuple[str, str]]]:
    """Replace ``$path.(type)`` with safe names; return rewritten
    expression + {name: (jsonpath, spark_type)}
    (mirrors pkg/cel/cel.go:59-101 parseExpression)."""
    variables: dict[str, tuple[str, str]] = {}

    def repl(m: re.Match) -> str:
        path, cel_type = m.group(1), m.group(2)
        if cel_type not in _CEL_TYPES:
            raise ValueError(
                f"cel: type must be one of {list(_CEL_TYPES)}, got {cel_type}"
            )
        safe = "vanus_" + re.sub(r"[.\[\]]", "_", path).strip("_")
        variables[safe] = ("$." + path, _CEL_TYPES[cel_type])
        return safe

    rewritten = _VAR_RE.sub(repl, expression)
    return rewritten, variables


def _cel_syntax_to_sql(expr: str) -> str:
    """Rewrite CEL operator spellings to Spark SQL."""
    out = []
    i = 0
    n = len(expr)
    while i < n:
        ch = expr[i]
        if ch == '"':  # CEL double-quoted string -> SQL single-quoted
            j = i + 1
            buf = []
            while j < n and expr[j] != '"':
                if expr[j] == "\\" and j + 1 < n:
                    buf.append(expr[j + 1])
                    j += 2
                    continue
                buf.append(expr[j])
                j += 1
            s = "".join(buf).replace("'", "''")
            out.append(f"'{s}'")
            i = j + 1
            continue
        if expr.startswith("&&", i):
            out.append(" AND ")
            i += 2
            continue
        if expr.startswith("||", i):
            out.append(" OR ")
            i += 2
            continue
        if expr.startswith("==", i):
            out.append(" = ")
            i += 2
            continue
        if expr.startswith("!=", i):
            out.append(" != ")
            i += 2
            continue
        if ch == "!":
            out.append(" NOT ")
            i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _schema_for_paths(paths: list[str]) -> str:
    """Minimal all-string struct schema covering the given $.a.b paths
    (string fields so from_json stringifies scalars; the typed
    try_cast afterwards reproduces the reference's coercions)."""
    tree: dict = {}
    for p in paths:
        parts = p[2:].split(".")  # strip "$."
        cur = tree
        for part in parts[:-1]:
            cur = cur.setdefault(part, {})
        cur.setdefault(parts[-1], None)

    def render(node: dict) -> str:
        fields = []
        for k, v in node.items():
            if isinstance(v, dict):
                fields.append(f"`{k}` struct<{render(v)}>")
            else:
                fields.append(f"`{k}` string")
        return ", ".join(fields)

    return render(tree)


def _skip_sql_string(s: str, i: int) -> int:
    """index just past the SQL string literal opening at s[i] == "'"
    ('' is the escape)."""
    i += 1
    while i < len(s):
        if s[i] == "'":
            if i + 1 < len(s) and s[i + 1] == "'":
                i += 2
                continue
            return i + 1
        i += 1
    return i


def _rewrite_ternary(s: str) -> str:
    """CEL ``cond ? a : b`` -> Spark SQL ``if(cond, a, b)``.

    Right-associative like CEL: the FIRST top-level '?' splits the
    condition, its matching ':' (skipping nested ternaries) splits
    then/else, and the else-branch recursion handles chains. Runs
    after the operator-spelling rewrite, so strings are SQL-quoted
    ('' escapes) and are skipped; parenthesized groups are recursed
    into so ``(c ? a : b) == 'hi'`` rewrites too."""
    depth, i = 0, 0
    while i < len(s):
        c = s[i]
        if c == "'":
            i = _skip_sql_string(s, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "?" and depth == 0:
            cond = s[:i]
            j, d2, nest = i + 1, 0, 0
            while j < len(s):
                cj = s[j]
                if cj == "'":
                    j = _skip_sql_string(s, j)
                    continue
                if cj == "(":
                    d2 += 1
                elif cj == ")":
                    d2 -= 1
                elif cj == "?" and d2 == 0:
                    nest += 1
                elif cj == ":" and d2 == 0:
                    if nest == 0:
                        break
                    nest -= 1
                j += 1
            if j >= len(s):
                raise ValueError("cel: '?' without matching ':'")
            # CASE with an explicit NOT-branch, not if(): a NULL
            # condition (failed extraction) must yield NULL so the
            # filter FAILS (reference: eval error fails the filter);
            # if() would silently take the else branch instead
            c = _rewrite_ternary(cond)
            return (
                f"(CASE WHEN ({c}) THEN {_rewrite_ternary(s[i + 1 : j])} "
                f"WHEN NOT ({c}) THEN {_rewrite_ternary(s[j + 1 :])} END)"
            )
        i += 1
    # no top-level ternary: rewrite inside parenthesized groups
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c == "'":
            nxt = _skip_sql_string(s, i)
            out.append(s[i:nxt])
            i = nxt
            continue
        if c == "(":
            d, j = 1, i + 1
            while j < len(s) and d:
                if s[j] == "'":
                    j = _skip_sql_string(s, j)
                    continue
                if s[j] == "(":
                    d += 1
                elif s[j] == ")":
                    d -= 1
                j += 1
            out.append("(" + _rewrite_ternary(s[i + 1 : j - 1]) + ")")
            i = j
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _bind_inferred_schema(
    inlined: str,
    variables: dict[str, tuple[str, str]],
    data_col: str,
    schema,
) -> Column | None:
    """One from_json over the INFERRED payload schema, every variable
    a struct/array walk off the bound parse — or None when any
    variable's path doesn't resolve to an atomic leaf (the caller
    then keeps the per-path route for the whole expression, so the
    plan never mixes half-bound parses)."""
    from vanus_spark.schema_infer import FRACTIONAL_TYPES, resolve_json_path

    exts: dict[str, str] = {}
    for name, (path, spark_type) in variables.items():
        r = resolve_json_path(schema, path)
        if r is None:
            return None
        ref, leaf = r
        if isinstance(leaf, FRACTIONAL_TYPES):
            # a fractional leaf's string rendering diverges from the
            # raw JSON text (3 -> '3.0'), so it is only bindable when
            # the declared type IS double — a same-type direct read.
            # Any other declaration must keep the get_json_object
            # route (try_cast('12.5' as long) is NULL; a direct
            # double->long cast would truncate instead).
            if spark_type != "double":
                return None
            exts[name] = f"cast(_ce_s{ref} AS double)"
        else:
            # through STRING first: long/bool/string leaves render
            # exactly the raw token, so try_cast failure semantics
            # match the get_json_object route bit-for-bit
            exts[name] = f"try_cast(cast(_ce_s{ref} AS string) AS {spark_type})"
    ddl = schema.simpleString()
    for name, extract in exts.items():
        inlined = re.sub(rf"\b{re.escape(name)}\b", extract, inlined)
    return F.expr(
        f"get(transform(array(from_json({data_col}, '{ddl}')), "
        f"_ce_s -> ({inlined})), 0)"
    )


def cel_to_column(
    expression: str, data_col: str = "data", data_schema=None
) -> Column:
    """Compile the CEL filter expression to a boolean Column over the
    JSON payload column. Stays fully JVM-side.

    The payload is parsed ONCE (`from_json` over the minimal schema of
    all referenced paths) instead of one `get_json_object` parse per
    variable — at N variables that's an N× reduction in JSON parsing,
    the hot cost of payload predicates.

    ``data_schema`` (a StructType, e.g. from
    ``schema_infer.infer_data_schema``) extends the single-parse route
    to SCHEMA-FREE payloads: every variable that resolves to an atomic
    leaf — including array-indexed paths the declared-paths schema
    cannot express — reads from one ``from_json`` over the full
    inferred schema. Leaves are cast through STRING before the typed
    try_cast, so coercion semantics match the get_json_object route
    exactly (a double 12.5 under an int64 declaration stays NULL,
    never truncates). Unresolvable variables keep per-path parsing."""
    rewritten, variables = extract_variables(expression)
    inlined = _rewrite_ternary(_cel_syntax_to_sql(rewritten))
    if not variables:
        return F.expr(inlined)
    if data_schema is not None and len(variables) >= 2:
        bound = _bind_inferred_schema(
            inlined, variables, data_col, data_schema
        )
        if bound is not None:
            return bound
    if len(variables) < 2 or any("[" in path for path, _ in variables.values()):
        # one referenced path => a single get_json_object IS the single
        # parse, without the struct-conversion overhead of from_json;
        # array-indexed paths aren't expressible as a struct schema —
        # both cases take the per-variable get_json_object route
        for name, (path, spark_type) in variables.items():
            extract = f"try_cast(get_json_object({data_col}, '{path}') AS {spark_type})"
            inlined = re.sub(rf"\b{re.escape(name)}\b", extract, inlined)
        return F.expr(inlined)
    schema = _schema_for_paths([path for path, _ in variables.values()])
    for name, (path, spark_type) in variables.items():
        field_ref = ".".join(f"`{p}`" for p in path[2:].split("."))
        extract = f"try_cast(_ce_s.{field_ref} AS {spark_type})"
        inlined = re.sub(rf"\b{re.escape(name)}\b", extract, inlined)
    # Bind the parsed struct as a lambda variable so the payload is
    # parsed ONCE however many variables reference it — inlining the
    # from_json per variable leaves N parses in the physical plan
    # (no CSE across a predicate's subtrees; measured 2 variables =
    # 2x one-variable cost at sf0.1).
    return F.expr(
        f"get(transform(array(from_json({data_col}, '{schema}')), "
        f"_ce_s -> ({inlined})), 0)"
    )
