"""CloudEvents SQL v1 -> Spark Column translator.

The reference embeds cloudevents/sdk-go/sql and parses the expression
once per subscription (reference: server/trigger/filter/cesql_filter.go:
32-67; dialect spec: github.com/cloudevents/spec — cesql v1).

Surface covered (everything the v1 spec defines):
  literals:   'str' (with '' escape), integers, TRUE/FALSE
  operators:  = != <> < <= > >=, LIKE / NOT LIKE (% _ wildcards),
              IN / NOT IN, AND OR XOR NOT, + - * / %, unary -
  predicates: EXISTS <attr>
  functions:  LENGTH CONCAT CONCAT_WS LOWER UPPER TRIM LEFT RIGHT
              SUBSTRING ABS INT BOOL STRING IS_BOOL IS_INT

Identifiers resolve to envelope attributes via
``model.attribute_column`` (spec attrs are columns, extensions live in
the attributes map). A missing attribute makes the whole filter fail,
so callers wrap the result with ``coalesce(p, false)``.

This compiles to a pure Catalyst expression tree — whole-stage
codegen, no Python at eval time.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, functions as F

from vanus_spark.model import attribute_column

_TOKEN_SPEC = [
    ("WS", r"\s+"),
    ("NUMBER", r"\d+(\.\d+)?"),
    ("STRING", r"'(?:[^']|'')*'"),
    ("DSTRING", r'"(?:[^"]|"")*"'),
    ("OP", r"<>|!=|<=|>=|=|<|>|\+|-|\*|/|%|\(|\)|,"),
    ("IDENT", r"[A-Za-z_][A-Za-z0-9_]*"),
]
_TOKEN_RE = re.compile("|".join(f"(?P<{n}>{p})" for n, p in _TOKEN_SPEC))

_KEYWORDS = {"AND", "OR", "XOR", "NOT", "LIKE", "EXISTS", "IN", "TRUE", "FALSE"}


@dataclass
class Tok:
    kind: str  # NUMBER STRING IDENT OP KEYWORD
    text: str


def tokenize(s: str) -> list[Tok]:
    toks: list[Tok] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise ValueError(f"cesql: cannot tokenize at {s[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        text = m.group()
        if kind == "WS":
            continue
        if kind == "IDENT" and text.upper() in _KEYWORDS:
            toks.append(Tok("KEYWORD", text.upper()))
        elif kind == "DSTRING":
            toks.append(Tok("STRING", "'" + text[1:-1].replace('""', '"') + "'"))
        else:
            toks.append(Tok(kind, text))
    return toks


class _Parser:
    """Pratt parser producing (Column, type_tag) pairs.

    type_tag in {"bool","num","str","attr","any"} drives the implicit
    coercions: comparing an attribute against a numeric operand casts
    the attribute to double (CESQL compares in the literal's type).
    """

    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    def peek(self) -> Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, text: str | None = None) -> Tok:
        t = self.peek()
        if t is None or t.kind != kind or (text is not None and t.text != text):
            raise ValueError(f"cesql: expected {text or kind}, got {t}")
        return self.next()

    # expr := or_expr
    def parse(self) -> tuple[Column, str]:
        out = self.parse_or()
        if self.peek() is not None:
            raise ValueError(f"cesql: trailing tokens at {self.peek()}")
        return out

    def parse_or(self) -> tuple[Column, str]:
        left, lt = self.parse_and()
        while (t := self.peek()) and t.kind == "KEYWORD" and t.text in ("OR", "XOR"):
            op = self.next().text
            # the right operand's REAL tag must drive the coercion: a
            # non-boolean attr here needs the try_cast route (NULL =>
            # filter fails); claiming it bool let the raw string reach
            # the OR, where ANSI's implicit cast ABORTED the whole job
            # on the first malformed value (found by the r5 fuzz probe)
            right, rt = self.parse_and()
            lb, rb = _as_bool(left, lt), _as_bool(right, rt)
            left = (lb | rb) if op == "OR" else (lb != rb)
            lt = "bool"
        return left, lt

    def parse_and(self) -> tuple[Column, str]:
        left, lt = self.parse_not()
        while (t := self.peek()) and t.kind == "KEYWORD" and t.text == "AND":
            self.next()
            right, rt = self.parse_not()
            left = _as_bool(left, lt) & _as_bool(right, rt)
            lt = "bool"
        return left, lt

    def parse_not(self) -> tuple[Column, str]:
        if (t := self.peek()) and t.kind == "KEYWORD" and t.text == "NOT":
            self.next()
            inner, it = self.parse_not()
            return ~_as_bool(inner, it), "bool"
        return self.parse_comparison()

    def parse_comparison(self) -> tuple[Column, str]:
        left, lt = self.parse_additive()
        t = self.peek()
        if t and t.kind == "OP" and t.text in ("=", "!=", "<>", "<", "<=", ">", ">="):
            op = self.next().text
            right, rt = self.parse_additive()
            lc, rc = _coerce_pair(left, lt, right, rt)
            if op == "=":
                return lc == rc, "bool"
            if op in ("!=", "<>"):
                return lc != rc, "bool"
            if op == "<":
                return lc < rc, "bool"
            if op == "<=":
                return lc <= rc, "bool"
            if op == ">":
                return lc > rc, "bool"
            return lc >= rc, "bool"
        negate = False
        if t and t.kind == "KEYWORD" and t.text == "NOT":
            nxt = self.toks[self.i + 1] if self.i + 1 < len(self.toks) else None
            if nxt and nxt.kind == "KEYWORD" and nxt.text in ("LIKE", "IN"):
                self.next()
                negate = True
                t = self.peek()
        if t and t.kind == "KEYWORD" and t.text == "LIKE":
            self.next()
            pat = self.expect("STRING").text
            c = left.cast("string").like(_unquote(pat))
            return (~c if negate else c), "bool"
        if t and t.kind == "KEYWORD" and t.text == "IN":
            self.next()
            self.expect("OP", "(")
            items: list[Column] = []
            types: list[str] = []
            while True:
                e, et = self.parse_additive()
                items.append(e)
                types.append(et)
                nt = self.peek()
                if nt and nt.kind == "OP" and nt.text == ",":
                    self.next()
                    continue
                break
            self.expect("OP", ")")
            lc = left.cast("string") if lt in ("attr", "str") else left
            c = lc.isin(*[i.cast("string") if lt in ("attr", "str") else i for i in items])
            return (~c if negate else c), "bool"
        return left, lt

    def parse_additive(self) -> tuple[Column, str]:
        left, lt = self.parse_multiplicative()
        while (t := self.peek()) and t.kind == "OP" and t.text in ("+", "-"):
            op = self.next().text
            right, rt = self.parse_multiplicative()
            lc, rc = _as_num(left, lt), _as_num(right, rt)
            left = (lc + rc) if op == "+" else (lc - rc)
            lt = "num"
        return left, lt

    def parse_multiplicative(self) -> tuple[Column, str]:
        left, lt = self.parse_unary()
        while (t := self.peek()) and t.kind == "OP" and t.text in ("*", "/", "%"):
            op = self.next().text
            right, rt = self.parse_unary()
            lc, rc = _as_num(left, lt), _as_num(right, rt)
            if op == "*":
                left = lc * rc
            elif op == "/":
                left = lc / rc
            else:
                left = lc % rc
            lt = "num"
        return left, lt

    def parse_unary(self) -> tuple[Column, str]:
        t = self.peek()
        if t and t.kind == "OP" and t.text == "-":
            self.next()
            inner, it = self.parse_unary()
            return -_as_num(inner, it), "num"
        return self.parse_primary()

    def parse_primary(self) -> tuple[Column, str]:
        t = self.peek()
        if t is None:
            raise ValueError("cesql: unexpected end of expression")
        if t.kind == "NUMBER":
            self.next()
            if "." in t.text:
                return F.lit(float(t.text)), "num"
            return F.lit(int(t.text)), "num"
        if t.kind == "STRING":
            self.next()
            return F.lit(_unquote(t.text)), "str"
        if t.kind == "KEYWORD" and t.text in ("TRUE", "FALSE"):
            self.next()
            return F.lit(t.text == "TRUE"), "bool"
        if t.kind == "KEYWORD" and t.text == "EXISTS":
            self.next()
            attr = self.expect("IDENT").text
            return attribute_column(attr.lower()).isNotNull(), "bool"
        if t.kind == "KEYWORD" and t.text == "NOT":
            self.next()
            inner, it = self.parse_not()
            return ~_as_bool(inner, it), "bool"
        if t.kind == "OP" and t.text == "(":
            self.next()
            e = self.parse_or()
            self.expect("OP", ")")
            return e
        if t.kind == "IDENT":
            self.next()
            nt = self.peek()
            if nt and nt.kind == "OP" and nt.text == "(":
                return self.parse_call(t.text.upper())
            return attribute_column(t.text.lower()), "attr"
        raise ValueError(f"cesql: unexpected token {t}")

    def parse_call(self, name: str) -> tuple[Column, str]:
        self.expect("OP", "(")
        args: list[tuple[Column, str]] = []
        if not (self.peek() and self.peek().kind == "OP" and self.peek().text == ")"):
            while True:
                args.append(self.parse_or())
                t = self.peek()
                if t and t.kind == "OP" and t.text == ",":
                    self.next()
                    continue
                break
        self.expect("OP", ")")
        return _call_function(name, args)


def _unquote(s: str) -> str:
    return s[1:-1].replace("''", "'")


def _as_bool(c: Column, t: str) -> Column:
    if t == "bool":
        return c
    return c.cast("string").try_cast("boolean")


def _as_num(c: Column, t: str) -> Column:
    if t == "num":
        return c
    return c.try_cast("double")


def _coerce_pair(lc: Column, lt: str, rc: Column, rt: str) -> tuple[Column, Column]:
    # CESQL evaluates comparisons in the type of the typed operand;
    # attributes are strings on the wire, so attr-vs-number casts the
    # attr to a number, attr-vs-attr / attr-vs-str compares as strings.
    if lt == "num" or rt == "num":
        return lc.try_cast("double"), rc.try_cast("double")
    if lt == "bool" or rt == "bool":
        return _as_bool(lc, lt), _as_bool(rc, rt)
    return lc.cast("string"), rc.cast("string")


def _call_function(name: str, args: list[tuple[Column, str]]) -> tuple[Column, str]:
    cols = [a[0] for a in args]
    tags = [a[1] for a in args]
    if name == "LENGTH":
        return F.length(cols[0].cast("string")), "num"
    if name == "CONCAT":
        return F.concat(*[c.cast("string") for c in cols]), "str"
    if name == "CONCAT_WS":
        # CESQL: CONCAT_WS(separator, s1, s2, ...); separator may be
        # any expression, so fold with concat instead of concat_ws.
        sep = cols[0].cast("string")
        out = cols[1].cast("string")
        for c in cols[2:]:
            out = F.concat(out, sep, c.cast("string"))
        return out, "str"
    if name == "LOWER":
        return F.lower(cols[0].cast("string")), "str"
    if name == "UPPER":
        return F.upper(cols[0].cast("string")), "str"
    if name == "TRIM":
        return F.trim(cols[0].cast("string")), "str"
    if name == "LEFT":
        return F.left(cols[0].cast("string"), cols[1].cast("int")), "str"
    if name == "RIGHT":
        return F.right(cols[0].cast("string"), cols[1].cast("int")), "str"
    if name == "SUBSTRING":
        if len(cols) == 3:
            return F.substring(cols[0].cast("string"), cols[1], cols[2]), "str"
        return cols[0].cast("string").substr(cols[1], F.length(cols[0].cast("string"))), "str"
    if name == "ABS":
        return F.abs(_as_num(cols[0], tags[0])), "num"
    if name == "INT":
        return cols[0].try_cast("long"), "num"
    if name == "BOOL":
        return _as_bool(cols[0], tags[0]), "bool"
    if name == "STRING":
        return cols[0].cast("string"), "str"
    if name == "IS_BOOL":
        return _as_bool(cols[0], tags[0]).isNotNull(), "bool"
    if name == "IS_INT":
        return cols[0].cast("string").try_cast("long").isNotNull(), "bool"
    raise ValueError(f"cesql: unknown function {name}")


def cesql_to_column(expression: str) -> Column:
    """Compile a CESQL expression to a boolean Column (filter use).

    Eval errors fail the filter, never raise (reference:
    cesql_filter.go:55-63) — the caller wraps with coalesce(p, false).
    """
    col, tag = _Parser(tokenize(expression)).parse()
    return _as_bool(col, tag)


def cesql_expr_column(expression: str) -> Column:
    """Compile a CESQL expression to its natural-typed Column (for
    projections — no boolean coercion)."""
    col, _tag = _Parser(tokenize(expression)).parse()
    return col
