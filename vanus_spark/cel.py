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


def cel_to_column(expression: str, data_col: str = "data") -> Column:
    """Compile the CEL filter expression to a boolean Column over the
    JSON payload column. Stays fully JVM-side."""
    rewritten, variables = extract_variables(expression)
    inlined = _cel_syntax_to_sql(rewritten)
    for name, (path, spark_type) in variables.items():
        extract = f"try_cast(get_json_object({data_col}, '{path}') AS {spark_type})"
        inlined = re.sub(rf"\b{re.escape(name)}\b", extract, inlined)
    return F.expr(inlined)
