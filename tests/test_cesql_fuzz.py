"""CESQL / CEL conformance fuzz (VERDICT r4 stretch item).

Random expressions are generated AST-FIRST, rendered to source text,
compiled by the translators (cesql.py / cel.py), and evaluated over a
small adversarial envelope fixture — then compared row-for-row against
an INDEPENDENT Python evaluator that implements the documented
semantics directly from the AST (three-valued logic, the cesql
coercion table, Spark cast/try_cast behavior, Java '%' sign rules,
LIKE with backslash escapes). The translator never sees the AST and
the evaluator never sees the source text, so tokenizer, parser,
coercions, and null propagation are all under test.

All expressions are evaluated in ONE batched select per chunk (the
fixture is 12 rows; a fuzz run is ~5 Spark jobs, not ~1000).
"""

from __future__ import annotations

import math
import random
import re

import pytest

from pyspark.sql import functions as F

from vanus_spark.cesql import cesql_to_column

ATTRS = ["type", "subject", "partitionkey", "id"]

# adversarial attribute values: numeric-ish, boolean-ish, quote chars,
# LIKE metacharacters, empty string vs NULL, mixed case, whitespace
ROWS = [
    {"type": "purchase", "subject": None, "partitionkey": "7", "id": "1"},
    {"type": "signup", "subject": "math", "partitionkey": None, "id": "2"},
    {"type": "SIGN_UP", "subject": "1", "partitionkey": "-3", "id": "3"},
    {"type": "view2", "subject": "", "partitionkey": "abc", "id": "4"},
    {"type": "", "subject": "o'quote", "partitionkey": "0", "id": "5"},
    {"type": "100", "subject": "x%y_z", "partitionkey": "12", "id": "6"},
    {"type": "12.5", "subject": "TRUE", "partitionkey": "1", "id": "7"},
    {"type": "true", "subject": "false", "partitionkey": "100", "id": "8"},
    {"type": " spaced ", "subject": "a\\b", "partitionkey": None, "id": "9"},
    {"type": "error", "subject": None, "partitionkey": "-100", "id": "10"},
    {"type": "view", "subject": "purchase", "partitionkey": "8", "id": "11"},
    {"type": "0", "subject": "yes", "partitionkey": "05", "id": "12"},
]

STR_POOL = [
    "purchase", "signup", "view", "", "1", "100", "12.5", "true",
    "o''quote", "a", "math", "TRUE",
]
LIKE_POOL = [
    "purch%", "%up", "s_gnup", "%", "_", "100", "x\\%y\\_z", "%e%",
    "SIGN\\_UP", "%''%",
]
INT_POOL = [-100, -3, 0, 1, 2, 7, 12, 100]
NONZERO_POOL = [-3, 1, 2, 7]


# ---------------------------------------------------------------------------
# AST generation: every node carries (kind, ...); `tag` mirrors the
# translator's type tags (attr/str/num/bool); `static_int` marks num
# nodes that stay integral in Spark (int literals closed under + - * %)
# ---------------------------------------------------------------------------


def gen_string(rng):  # -> node with tag str|attr
    if rng.random() < 0.5:
        return ("attr", rng.choice(ATTRS))
    return ("str", rng.choice(STR_POOL))


def gen_num(rng, depth):  # -> node with tag num|attr, static_int flag
    r = rng.random()
    if depth <= 0 or r < 0.35:
        return ("int", rng.choice(INT_POOL)), True
    if r < 0.5:
        return ("attr", rng.choice(ATTRS)), False
    if r < 0.6:
        inner, ii = gen_num(rng, depth - 1)
        return ("neg", inner), ii
    if r < 0.7:
        inner, ii = gen_num(rng, depth - 1)
        return ("fn", "ABS", [inner]), ii
    op = rng.choice("+-*/%")
    l, li = gen_num(rng, depth - 1)
    if op in "/%":
        rnode, ri = ("int", rng.choice(NONZERO_POOL)), True
    else:
        rnode, ri = gen_num(rng, depth - 1)
    static_int = li and ri and op != "/"
    return ("arith", op, l, rnode), static_int


def gen_bool(rng, depth):  # -> boolean-rooted node
    r = rng.random()
    if depth <= 0 or r < 0.08:
        return ("bool", rng.random() < 0.5)
    if r < 0.16:
        return ("exists", rng.choice(ATTRS))
    if r < 0.30:  # string comparison
        op = rng.choice(["=", "!=", "<>", "<", "<=", ">", ">="])
        return ("cmp", op, gen_string(rng), gen_string(rng))
    if r < 0.44:  # numeric comparison
        op = rng.choice(["=", "!=", "<", "<=", ">", ">="])
        l, _ = gen_num(rng, depth - 1)
        rn, _ = gen_num(rng, depth - 1)
        return ("cmp", op, l, rn)
    if r < 0.52:
        return (
            "like",
            rng.random() < 0.3,
            gen_string(rng),
            rng.choice(LIKE_POOL),
        )
    if r < 0.60:
        items = [("str", rng.choice(STR_POOL)) for _ in range(rng.randint(1, 3))]
        if rng.random() < 0.4:
            items.append(("int", rng.choice(INT_POOL)))
        return ("in", rng.random() < 0.3, gen_string(rng), items)
    if r < 0.68:
        s = gen_string(rng)
        fn = rng.choice(["len_cmp", "case_cmp", "isint", "isbool"])
        if fn == "len_cmp":
            return ("cmp", ">", ("fn", "LENGTH", [s]), ("int", rng.choice([0, 1, 4])))
        if fn == "case_cmp":
            f = rng.choice(["LOWER", "UPPER", "TRIM"])
            return ("cmp", "=", ("fn", f, [s]), gen_string(rng))
        if fn == "isint":
            return ("fn", "IS_INT", [s])
        return ("fn", "IS_BOOL", [s])
    if r < 0.76:  # LEFT/RIGHT/CONCAT string builders under a compare
        s1, s2 = gen_string(rng), gen_string(rng)
        which = rng.choice(["LEFT", "RIGHT", "CONCAT"])
        if which == "CONCAT":
            node = ("fn", "CONCAT", [s1, s2])
        else:
            node = ("fn", which, [s1, ("int", rng.choice([0, 1, 2, 5]))])
        return ("cmp", rng.choice(["=", "!="]), node, gen_string(rng))
    if r < 0.82:  # SUBSTRING / CONCAT_WS / STRING builders (late-r5 ext)
        which = rng.choice(["SUBSTR2", "SUBSTR3", "CONCAT_WS", "STRING"])
        if which == "SUBSTR2":
            node = ("fn", "SUBSTRING",
                    [gen_string(rng), ("int", rng.choice([1, 2, 3, 5]))])
        elif which == "SUBSTR3":
            node = ("fn", "SUBSTRING",
                    [gen_string(rng), ("int", rng.choice([1, 2, 3])),
                     ("int", rng.choice([0, 1, 2, 4]))])
        elif which == "CONCAT_WS":
            node = ("fn", "CONCAT_WS",
                    [("str", rng.choice(["-", ",", ""])),
                     gen_string(rng), gen_string(rng)])
        else:
            node = ("fn", "STRING", [("int", rng.choice(INT_POOL))])
        return ("cmp", rng.choice(["=", "!="]), node, gen_string(rng))
    op = rng.choice(["and", "or", "xor", "not"])

    def operand():
        # sometimes a RAW attr/str atom as the boolean operand — the
        # coercion-to-bool path (r5 regression: parse_or discarded the
        # right operand's tag, so a non-boolean attr ABORTED the job
        # via ANSI's implicit cast instead of failing the filter)
        if rng.random() < 0.15:
            return gen_string(rng)
        return gen_bool(rng, depth - 1)

    if op == "not":
        return ("not", operand())
    return (op, operand(), operand())


# ---------------------------------------------------------------------------
# render AST -> CESQL source (fully parenthesized)
# ---------------------------------------------------------------------------


def render(n) -> str:
    k = n[0]
    if k == "attr":
        return n[1]
    if k == "str":
        return f"'{n[1]}'"
    if k == "int":
        return str(n[1]) if n[1] >= 0 else f"(-{-n[1]})"
    if k == "bool":
        return "TRUE" if n[1] else "FALSE"
    if k == "exists":
        return f"(EXISTS {n[1]})"
    if k == "cmp":
        return f"({render(n[2])} {n[1]} {render(n[3])})"
    if k == "like":
        neg = "NOT LIKE" if n[1] else "LIKE"
        return f"({render(n[2])} {neg} '{n[3]}')"
    if k == "in":
        neg = "NOT IN" if n[1] else "IN"
        items = ", ".join(render(i) for i in n[3])
        return f"({render(n[2])} {neg} ({items}))"
    if k in ("and", "or", "xor"):
        return f"({render(n[1])} {k.upper()} {render(n[2])})"
    if k == "not":
        return f"(NOT {render(n[1])})"
    if k == "arith":
        return f"({render(n[2])} {n[1]} {render(n[3])})"
    if k == "neg":
        return f"(-{render(n[1])})"
    if k == "fn":
        return f"{n[1]}({', '.join(render(a) for a in n[2])})"
    raise AssertionError(k)


# ---------------------------------------------------------------------------
# the independent Python evaluator (documented semantics, not the
# translator's code): returns (value, tag)
# ---------------------------------------------------------------------------

_TRUE_SET = {"t", "true", "y", "yes", "1"}
_FALSE_SET = {"f", "false", "n", "no", "0"}


def _str_to_bool(s):
    s = s.strip().lower()
    if s in _TRUE_SET:
        return True
    if s in _FALSE_SET:
        return False
    return None


def _str_to_double(s):
    try:
        return float(s.strip())
    except (ValueError, AttributeError):
        return None


def _str_to_long(s):
    s = s.strip()
    if re.fullmatch(r"[+-]?\d+", s or ""):
        return int(s)
    return None


def _as_num(v, tag):
    """_as_num semantics: tag num passes through (int stays int);
    anything else try_casts to double."""
    if tag == "num":
        return v
    if v is None:
        return None
    if tag == "bool":
        return 1.0 if v else 0.0
    return _str_to_double(v)


def _as_bool(v, tag):
    if tag == "bool":
        return v
    if v is None:
        return None
    if tag == "num":
        # cast num -> string -> boolean: only integral '1'/'0'-style
        # tokens parse; any double rendering ('1.0') does not
        return _str_to_bool(str(v)) if isinstance(v, int) else None
    return _str_to_bool(v)


def _to_string(v, tag):
    if v is None:
        return None
    if tag == "bool":
        return "true" if v else "false"
    if tag == "num":
        return str(v) if isinstance(v, int) else _spark_double_str(v)
    return v


def _spark_double_str(f):
    # only reachable for doubles built from our int pools / parses —
    # Java's shortest-repr matches Python for these simple values
    s = repr(float(f))
    return s


def _like_match(s, pat):
    rx, i = [], 0
    while i < len(pat):
        ch = pat[i]
        if ch == "\\" and i + 1 < len(pat):
            rx.append(re.escape(pat[i + 1]))
            i += 2
            continue
        if ch == "%":
            rx.append(".*")
        elif ch == "_":
            rx.append(".")
        else:
            rx.append(re.escape(ch))
        i += 1
    return re.fullmatch("".join(rx), s, re.DOTALL) is not None


def _java_mod(a, b):
    if isinstance(a, int) and isinstance(b, int):
        r = abs(a) % abs(b)
        return -r if a < 0 else r
    return math.fmod(a, b)


def pyeval(n, row):
    k = n[0]
    if k == "attr":
        return row.get(n[1]), "attr"
    if k == "str":
        return n[1].replace("''", "'"), "str"
    if k == "int":
        return n[1], "num"
    if k == "bool":
        return n[1], "bool"
    if k == "exists":
        return row.get(n[1]) is not None, "bool"
    if k == "cmp":
        op = n[1]
        lv, lt = pyeval(n[2], row)
        rv, rt = pyeval(n[3], row)
        if lt == "num" or rt == "num":
            lv = float(_as_num(lv, lt)) if _as_num(lv, lt) is not None else None
            rv = float(_as_num(rv, rt)) if _as_num(rv, rt) is not None else None
        elif lt == "bool" or rt == "bool":
            lv, rv = _as_bool(lv, lt), _as_bool(rv, rt)
        else:
            lv, rv = _to_string(lv, lt), _to_string(rv, rt)
        if lv is None or rv is None:
            return None, "bool"
        if op == "=":
            return lv == rv, "bool"
        if op in ("!=", "<>"):
            return lv != rv, "bool"
        if op == "<":
            return lv < rv, "bool"
        if op == "<=":
            return lv <= rv, "bool"
        if op == ">":
            return lv > rv, "bool"
        return lv >= rv, "bool"
    if k == "like":
        sv, st = pyeval(n[2], row)
        s = _to_string(sv, st)
        if s is None:
            return None, "bool"
        m = _like_match(s, n[3].replace("''", "'"))
        return (not m) if n[1] else m, "bool"
    if k == "in":
        lv, lt = pyeval(n[2], row)
        s = _to_string(lv, lt)
        if s is None:
            return None, "bool"
        items = [_to_string(*pyeval(i, row)) for i in n[3]]
        m = s in items
        return (not m) if n[1] else m, "bool"
    if k in ("and", "or"):
        lv = _as_bool(*pyeval(n[1], row))
        rv = _as_bool(*pyeval(n[2], row))
        if k == "and":
            if lv is False or rv is False:
                return False, "bool"
            if lv is None or rv is None:
                return None, "bool"
            return True, "bool"
        if lv is True or rv is True:
            return True, "bool"
        if lv is None or rv is None:
            return None, "bool"
        return False, "bool"
    if k == "xor":
        lv = _as_bool(*pyeval(n[1], row))
        rv = _as_bool(*pyeval(n[2], row))
        if lv is None or rv is None:
            return None, "bool"
        return lv != rv, "bool"
    if k == "not":
        v = _as_bool(*pyeval(n[1], row))
        return (None if v is None else not v), "bool"
    if k == "neg":
        v = _as_num(*pyeval(n[1], row))
        return (None if v is None else -v), "num"
    if k == "arith":
        op = n[1]
        lv = _as_num(*pyeval(n[2], row))
        rv = _as_num(*pyeval(n[3], row))
        if lv is None or rv is None:
            return None, "num"
        if op == "+":
            return lv + rv, "num"
        if op == "-":
            return lv - rv, "num"
        if op == "*":
            return lv * rv, "num"
        if op == "/":
            return float(lv) / float(rv), "num"
        return _java_mod(lv, rv), "num"
    if k == "fn":
        name, args = n[1], n[2]
        if name == "ABS":
            v = _as_num(*pyeval(args[0], row))
            return (None if v is None else abs(v)), "num"
        if name == "LENGTH":
            s = _to_string(*pyeval(args[0], row))
            return (None if s is None else len(s)), "num"
        if name in ("LOWER", "UPPER", "TRIM"):
            s = _to_string(*pyeval(args[0], row))
            if s is None:
                return None, "str"
            if name == "LOWER":
                return s.lower(), "str"
            if name == "UPPER":
                return s.upper(), "str"
            return s.strip(" "), "str"
        if name == "CONCAT":
            parts = [_to_string(*pyeval(a, row)) for a in args]
            if any(p is None for p in parts):
                return None, "str"
            return "".join(parts), "str"
        if name in ("LEFT", "RIGHT"):
            s = _to_string(*pyeval(args[0], row))
            nn, _ = pyeval(args[1], row)
            if s is None:
                return None, "str"
            if name == "LEFT":
                return s[:nn], "str"
            return (s[max(len(s) - nn, 0):] if nn > 0 else ""), "str"
        if name == "SUBSTRING":
            s = _to_string(*pyeval(args[0], row))
            pos, _ = pyeval(args[1], row)
            if s is None:
                return None, "str"
            if len(args) == 3:
                ln, _ = pyeval(args[2], row)
                return s[pos - 1 : pos - 1 + ln], "str"
            return s[pos - 1 :], "str"
        if name == "CONCAT_WS":
            parts = [_to_string(*pyeval(a, row)) for a in args]
            if any(p is None for p in parts):
                return None, "str"
            return parts[0].join(parts[1:]), "str"
        if name == "STRING":
            return _to_string(*pyeval(args[0], row)), "str"
        if name == "IS_INT":
            s = _to_string(*pyeval(args[0], row))
            return (False if s is None else _str_to_long(s) is not None), "bool"
        if name == "IS_BOOL":
            v, t = pyeval(args[0], row)
            b = _as_bool(v, t)
            return b is not None, "bool"
    raise AssertionError(n)


# ---------------------------------------------------------------------------
# the fuzz driver
# ---------------------------------------------------------------------------

N_EXPRS = 1200
CHUNK = 200


@pytest.fixture(scope="module")
def envelope(spark):
    rows = [
        (
            r["id"],
            "/s",
            "1.0",
            r["type"],
            None,
            r["subject"],
            {"partitionkey": r["partitionkey"]}
            if r["partitionkey"] is not None
            else {},
            "{}",
        )
        for r in ROWS
    ]
    return spark.createDataFrame(
        rows,
        "id string, source string, specversion string, type string, "
        "dataschema string, subject string, attributes map<string,string>, "
        "data string",
    ).cache()


def test_cesql_fuzz_conformance(envelope):
    rng = random.Random(20260814)
    asts = [gen_bool(rng, 3) for _ in range(N_EXPRS)]

    def run_chunk(base):
        # builds are py4j/socket-bound, so chunks overlap well on a
        # small thread pool (same cases, ~3x less wall)
        chunk = asts[base : base + CHUNK]
        cols = [
            F.coalesce(cesql_to_column(render(a)), F.lit(False)).alias(f"c{i}")
            for i, a in enumerate(chunk)
        ]
        got = envelope.select(*cols).collect()
        bad = []
        for ri, row in enumerate(ROWS):
            for ci, ast in enumerate(chunk):
                v, t = pyeval(ast, row)
                want = bool(_as_bool(v, t))  # None -> False (WHERE)
                if got[ri][f"c{ci}"] != want:
                    bad.append((render(ast), row["id"], got[ri][f"c{ci}"], want))
        return bad

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        mismatches = [
            m
            for bad in pool.map(run_chunk, range(0, N_EXPRS, CHUNK))
            for m in bad
        ]
    assert not mismatches, f"{len(mismatches)} divergences, first 5: {mismatches[:5]}"


# ---------------------------------------------------------------------------
# CEL fuzz: typed-variable predicates over random JSON payloads — BOTH
# compile routes (per-path get_json_object fallback AND the inferred-
# schema single-parse binding) against the same Python oracle
# ---------------------------------------------------------------------------

import json

from vanus_spark.filters import compile_filter

CEL_KEYS = ["a", "b", "c", "s"]
CEL_TYPES = {"a": "int64", "b": "double", "s": "string", "c": "bool"}


def _gen_payloads(rng, n=24):
    out = []
    for i in range(n):
        d = {}
        if rng.random() < 0.85:
            d["a"] = rng.choice([-5, 0, 3, 12, 100, "7", "x", 2.5])
        if rng.random() < 0.85:
            d["b"] = rng.choice([-1.5, 0.25, 3.0, 12, "4.5", "y", True])
        if rng.random() < 0.85:
            d["c"] = rng.choice([True, False, "true", "no", 1, "maybe"])
        if rng.random() < 0.85:
            d["s"] = rng.choice(["alpha", "Beta", "", "12", "true", "x y"])
        out.append((i, json.dumps(d)))
    return out


def _raw_token(v):
    """The token text get_json_object yields for a scalar."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return json.dumps(v)
    return v


def _cel_cast(text, typ):
    if text is None:
        return None
    if typ in ("int64",):
        return _str_to_long(text)
    if typ == "double":
        return _str_to_double(text)
    if typ == "bool":
        return _str_to_bool(text)
    return text


def _gen_cel(rng, depth=2):
    """(source_fragment, eval(payload) -> bool|None)"""
    r = rng.random()
    if depth <= 0 or r < 0.5:
        key = rng.choice(CEL_KEYS)
        typ = CEL_TYPES[key]
        var = f"${key}.({typ})"
        if typ in ("int64", "double"):
            lit = rng.choice([-5, 0, 3, 12]) if typ == "int64" else rng.choice(
                [-1.5, 0.25, 3.0, 12.0]
            )
            op = rng.choice(["==", "!=", "<", "<=", ">", ">="])
            pyop = {
                "==": lambda x, y: x == y,
                "!=": lambda x, y: x != y,
                "<": lambda x, y: x < y,
                "<=": lambda x, y: x <= y,
                ">": lambda x, y: x > y,
                ">=": lambda x, y: x >= y,
            }[op]

            def ev(p, key=key, typ=typ, lit=lit, pyop=pyop):
                v = _cel_cast(_raw_token(p.get(key)), typ)
                return None if v is None else pyop(float(v), float(lit))

            return f"{var} {op} {json.dumps(lit)}", ev
        if typ == "bool":
            want = rng.random() < 0.5

            def ev(p, key=key, want=want):
                v = _cel_cast(_raw_token(p.get(key)), "bool")
                return None if v is None else (v == want)

            return f"{var} == {'true' if want else 'false'}", ev
        lit = rng.choice(["alpha", "Beta", "", "12"])
        neg = rng.random() < 0.5

        def ev(p, key=key, lit=lit, neg=neg):
            v = _cel_cast(_raw_token(p.get(key)), "string")
            if v is None:
                return None
            return (v != lit) if neg else (v == lit)

        return f'{var} {"!=" if neg else "=="} "{lit}"', ev
    if r < 0.6:
        frag, ev0 = _gen_cel(rng, depth - 1)

        def ev(p, ev0=ev0):
            v = ev0(p)
            return None if v is None else not v

        return f"!({frag})", ev
    if r < 0.7:
        # ternary: a NULL condition (failed extraction) must fail the
        # whole comparison, never fall through to the else branch
        cf, ce = _gen_cel(rng, depth - 1)
        pick = rng.choice(["A", "B"])

        def ev(p, ce=ce, pick=pick):
            c = ce(p)
            if c is None:
                return None
            return ("A" if c else "B") == pick

        return f'(({cf}) ? "A" : "B") == "{pick}"', ev
    op = rng.choice(["&&", "||"])
    lf, le = _gen_cel(rng, depth - 1)
    rf, re_ = _gen_cel(rng, depth - 1)

    def ev(p, le=le, re_=re_, op=op):
        lv, rv = le(p), re_(p)
        if op == "&&":
            if lv is False or rv is False:
                return False
            if lv is None or rv is None:
                return None
            return True
        if lv is True or rv is True:
            return True
        if lv is None or rv is None:
            return None
        return False

    return f"({lf}) {op} ({rf})", ev


def test_cel_fuzz_both_routes(spark):
    from vanus_spark.schema_infer import infer_data_schema

    rng = random.Random(41)
    payloads = _gen_payloads(rng)
    df = spark.createDataFrame(payloads, "pid long, data string").cache()
    schema = infer_data_schema(df)
    exprs = [_gen_cel(rng, 2) for _ in range(400)]
    dicts = [json.loads(p) for _, p in payloads]
    def run_chunk(base):
        chunk = exprs[base : base + 100]
        cols = []
        for i, (frag, _) in enumerate(chunk):
            spec = {"cel": frag}
            cols.append(
                F.coalesce(compile_filter(spec), F.lit(False)).alias(f"f{i}")
            )
            cols.append(
                F.coalesce(
                    compile_filter(spec, data_schema=schema), F.lit(False)
                ).alias(f"s{i}")
            )
        got = df.orderBy("pid").select(*cols).collect()
        bad = []
        for ri, p in enumerate(dicts):
            for ci, (frag, ev) in enumerate(chunk):
                want = bool(ev(p))
                if got[ri][f"f{ci}"] != want:
                    bad.append((frag, p, "fallback"))
                if got[ri][f"s{ci}"] != want:
                    bad.append((frag, p, "schema-bound"))
        return bad

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        mismatches = [
            m
            for bad in pool.map(run_chunk, range(0, len(exprs), 100))
            for m in bad
        ]
    assert not mismatches, mismatches[:5]
