"""Property-based tests (hypothesis) for the pure-Python kernels —
exceeding the reference's own test strategy, which has none (SURVEY §5)."""

from __future__ import annotations

import json
import string

import pytest
from hypothesis import given, settings, strategies as st

from vanus_spark.casts import CastError, py_cast
from vanus_spark.jsonpath import JSONPathNotExist, py_delete, py_get, py_set
from vanus_spark.model import decode_event_id, encode_event_id
from vanus_spark.templates import parse_text_template, render_text
from vanus_spark.delivery import backoff_seconds

KEY = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=6)
SCALAR = st.one_of(
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=20),
    st.booleans(),
)


@given(SCALAR)
def test_cast_to_string_total(v):
    # anything -> String is always defined (cast.go:31-48)
    s = py_cast(v, "string")
    assert isinstance(s, str)


@given(st.dictionaries(KEY, SCALAR, max_size=4))
def test_cast_map_to_string_is_json(d):
    s = py_cast(d, "string")
    assert json.loads(s) == json.loads(json.dumps(d))


@given(st.integers(min_value=-(2**53), max_value=2**53))
def test_cast_int_roundtrip(v):
    assert py_cast(py_cast(v, "string"), "int") == v


@given(st.floats(allow_nan=False, allow_infinity=False, min_value=-1e15, max_value=1e15))
def test_cast_float_to_int_truncates(v):
    assert py_cast(v, "int") == int(v)


@given(st.text(max_size=10))
def test_cast_bad_int_raises_not_nulls(s):
    # Vanus: non-numeric string -> ERROR (not NULL like Spark CAST)
    try:
        int(s, 10)
        valid = True
    except ValueError:
        valid = False
    if not valid:
        with pytest.raises(CastError):
            py_cast(s, "int")


@given(SCALAR)
def test_cast_scalar_to_string_array_wraps(v):
    if isinstance(v, bool):
        return  # bool -> stringArray undefined in the lattice
    assert py_cast(v, "string_array") == [py_cast(v, "string")]


@given(st.lists(KEY, min_size=1, max_size=4, unique=True), SCALAR)
def test_jsonpath_set_get_roundtrip(path_parts, v):
    path = "$." + ".".join(path_parts)
    data = py_set({}, path, v)
    assert py_get(data, path) == v
    py_delete(data, path)
    with pytest.raises(JSONPathNotExist):
        py_get(data, path)


@given(st.integers(min_value=0, max_value=2**64 - 1), st.integers(min_value=0, max_value=2**64 - 1))
def test_event_id_roundtrip(log, off):
    assert decode_event_id(encode_event_id(log, off)) == (log, off)


@given(st.text(max_size=30).filter(lambda s: "<" not in s and "\\" not in s))
def test_text_template_literal_identity(s):
    segs = parse_text_template(s)
    assert render_text(segs, {}, {}) == s


@given(st.integers(min_value=1, max_value=1000))
def test_backoff_monotone_capped(n):
    # schedule is monotone nondecreasing and capped at 3600
    assert backoff_seconds(n) <= 3600
    if n > 1:
        assert backoff_seconds(n) >= backoff_seconds(n - 1)


# ---------------------------------------------------------------------------
# media codecs (round-3 kernels)
# ---------------------------------------------------------------------------

@given(
    st.integers(min_value=1, max_value=500),
    st.sampled_from([1, 2]),
    st.sampled_from([8000, 16000, 44100]),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=30, deadline=None)
def test_wav_16bit_roundtrip_property(n, ch, rate, seed):
    import numpy as np

    from vanus_spark.llm.audio import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32767, size=(n, ch), dtype=np.int16)
    out_rate, out = decode_wav(encode_wav(x, rate))
    assert out_rate == rate and out.shape == (n, ch)
    assert (out * 32768.0 == x).all()


@given(
    st.integers(min_value=1, max_value=300),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=30, deadline=None)
def test_wav_8bit_roundtrip_property(n, seed):
    import numpy as np

    from vanus_spark.llm.audio import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    x = rng.integers(0, 256, size=n, dtype=np.uint8)
    rate, out = decode_wav(encode_wav(x, 8000, bits=8))
    assert ((out[:, 0] * 128.0 + 128) == x).all()


@given(
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=4),
    st.sampled_from([b"C444", b"Cmono"]),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=30, deadline=None)
def test_y4m_frame_walk_property(w, h, nf, cs, seed):
    import numpy as np

    from vanus_spark.llm.video import _iter_y4m_frames

    rng = np.random.default_rng(seed)
    sixths = {b"C444": 18, b"Cmono": 6}[cs]
    frame_len = w * h * sixths // 6
    payloads = [rng.integers(0, 256, frame_len, dtype=np.uint8) for _ in range(nf)]
    raw = b"YUV4MPEG2 W%d H%d F25:1 %s\n" % (w, h, cs)
    for p in payloads:
        raw += b"FRAME\n" + p.tobytes()
    frames = list(_iter_y4m_frames(raw))
    assert len(frames) == nf
    for i, (idx, y, u, v) in enumerate(frames):
        assert idx == i and y.shape == (h, w)
        assert (y.reshape(-1) == payloads[i][: w * h]).all()
        if cs == b"Cmono":
            assert u is None and v is None
        else:
            assert (u == payloads[i][w * h : 2 * w * h]).all()


def _rand_json(rng, depth=0):
    """Random nested doc: ascii keys, int/str/bool/null scalars (no
    floats — their text renderings differ across serializers, which
    is not what this fuzz is about)."""
    if depth >= 3 or rng.random() < 0.35:
        return rng.choice(
            [rng.randint(-1000, 1000), "s" + str(rng.randint(0, 99)),
             True, False, None]
        )
    if rng.random() < 0.5:
        return {
            k: _rand_json(rng, depth + 1)
            for k in rng.sample(["a", "b", "c", "d", "e"], rng.randint(1, 3))
        }
    return [_rand_json(rng, depth + 1) for _ in range(rng.randint(1, 3))]


def _rand_paths(rng, doc, n):
    """Mix of paths that exist in doc (walked) and random ones."""
    existing = []

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{path}.{k}")
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, f"{path}[{i}]")
        if path:
            existing.append(path)

    walk(doc, "")
    out = []
    for _ in range(n):
        if existing and rng.random() < 0.6:
            out.append("$" + rng.choice(existing))
        else:
            parts = "".join(
                rng.choice([f".{rng.choice('abcdef')}", f"[{rng.randint(0,3)}]"])
                for _ in range(rng.randint(1, 3))
            )
            out.append("$" + parts)
    return out


def _expected_get_json(doc, path):
    """What Spark's get_json_object should return for (doc, path),
    derived from py_get: None when missing or JSON null; raw token
    for scalars; compact JSON for containers."""
    try:
        v = py_get(doc, path)
    except JSONPathNotExist:
        return None
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (dict, list)):
        return json.dumps(v, separators=(",", ":"))
    return str(v)


def test_jsonpath_column_matches_python_kernel_fuzz(spark):
    """The JVM column path (get_json_col -> get_json_object) and the
    pure-Python kernel (py_get) must agree on every (doc, path): the
    filters compile through the former, the interpreter walks the
    latter, and a divergence would split the two execution paths'
    filter decisions. 100 random docs x 50 random paths, batched into
    two Spark jobs."""
    import random as _random

    from pyspark.sql import functions as F

    from vanus_spark.jsonpath import get_json_col

    rng = _random.Random(20260814)
    docs = [_rand_json(rng, 0) for _ in range(100)]
    # ensure container roots (get_json_object over bare scalars is
    # not a case the engine produces: data envelopes are objects)
    docs = [d if isinstance(d, (dict, list)) else {"a": d} for d in docs]
    paths = []
    for d in docs[:25]:
        paths.extend(_rand_paths(rng, d, 2))
    seen = set()
    paths = [p for p in paths if not (p in seen or seen.add(p))][:50]

    df = spark.createDataFrame(
        [(i, json.dumps(d, separators=(",", ":"))) for i, d in enumerate(docs)],
        "i int, data string",
    )
    mismatches = []
    for lo in range(0, len(paths), 25):
        chunk = paths[lo : lo + 25]
        cols = [F.col("i")] + [
            get_json_col("data", p).alias(f"p{j}") for j, p in enumerate(chunk)
        ]
        for row in df.select(*cols).collect():
            for j, p in enumerate(chunk):
                got = row[f"p{j}"]
                want = _expected_get_json(docs[row.i], p)
                if got != want:
                    mismatches.append((row.i, p, want, got))
    assert not mismatches, mismatches[:10]


def test_text_template_compiled_vs_interpreter_fuzz(spark, cloudevents):
    """Split-path parity for TEXT templates: the static Column
    compiler (templates.compile_text_template — concat of literals,
    attribute columns, get_json_object extracts) must render exactly
    what the interpreter (parse_text_template + render_text) produces
    for the same event, across 120 random templates mixing literal
    runs, envelope attributes (present and absent), and data paths
    (present and missing). Batched: ~5 Spark jobs."""
    import random as _random

    from pyspark.sql import functions as F

    from vanus_spark.templates import (
        build_template_model,
        compile_text_template,
        parse_text_template,
        render_text,
    )

    rng = _random.Random(20260815)
    placeholders = [
        "<$.data.user_id>", "<$.data.value>", "<$.data.nope>",
        "<type>", "<id>", "<source>", "<subject>", "<specversion>",
        "<$.type>", "<$.data.user_id>",
    ]
    lit_chars = "abc XYZ09.,:-_/!?"

    def rand_template():
        parts = []
        for _ in range(rng.randint(1, 6)):
            if rng.random() < 0.5:
                parts.append(
                    "".join(rng.choice(lit_chars) for _ in range(rng.randint(1, 8)))
                )
            else:
                parts.append(rng.choice(placeholders))
        return "".join(parts)

    templates = [rand_template() for _ in range(120)]
    ce = cloudevents.where(F.col("id") < 40).select(
        "id", "source", "specversion", "type", "subject", "attributes", "data"
    )
    rows = ce.collect()

    def py_render(t, r):
        attrs = {
            "id": str(r.id), "source": r.source,
            "specversion": r.specversion, "type": r.type,
            "subject": r.subject,
        }
        attrs.update(dict(r.attributes or {}))
        data = json.loads(r.data) if r.data else None
        model = build_template_model(attrs, data)
        return render_text(parse_text_template(t), model, {})

    mismatches = []
    for lo in range(0, len(templates), 25):
        chunk = templates[lo : lo + 25]
        out = ce.select(
            "id",
            *[compile_text_template(t).alias(f"t{j}") for j, t in enumerate(chunk)],
        ).collect()
        by_id = {r.id: r for r in rows}
        for orow in out:
            for j, t in enumerate(chunk):
                want = py_render(t, by_id[orow.id])
                got = orow[f"t{j}"]
                if got != want:
                    mismatches.append((orow.id, t, want, got))
    assert not mismatches, mismatches[:5]


def test_date_format_php_tokens_compiled_vs_python_fuzz(spark):
    """PHP-token DATE_FORMAT translation parity: the java.time pattern
    the compiled path builds (php_format_to_java -> F.date_format)
    must render exactly what the interpreter's strftime translation
    (php_format_to_strftime) renders, across random formats mixing
    every known token, escaped letters, unknown letters (literal
    pass-through), punctuation, and a trailing backslash."""
    import datetime as _dt
    import random as _random

    from pyspark.sql import functions as F

    from vanus_spark.actions.interp import php_format_to_strftime
    from vanus_spark.functions.scalars import date_format_php

    rng = _random.Random(20260817)
    atoms = (
        list("dmYyhHis")            # known tokens
        + ["\\d", "\\m", "\\Q", "\\z"]  # escaped letters -> literals
        + list("QLzT")              # unknown letters -> literals
        + list(" :-/.,")            # punctuation passes through
    )
    fmts = [
        "".join(rng.choice(atoms) for _ in range(rng.randint(1, 8)))
        for _ in range(78)
    ] + ["Y-m-d H:i:s", "d/m/y h.i"]

    stamps = [
        _dt.datetime(2024, 1, 5, 0, 7, 9),    # midnight: h -> 12
        _dt.datetime(2024, 12, 31, 13, 59, 59),
        _dt.datetime(1999, 2, 28, 12, 0, 0),
        _dt.datetime(2024, 6, 15, 23, 5, 1),
    ]
    # Formats whose adjacent tokens would merge into one java.time
    # field (PHP 'dd' -> java 'dddd') are rejected by the compiled
    # translation — the compiler falls back to the interpreter there,
    # so parity holds by construction; the fuzz checks the rest.
    from vanus_spark.functions.scalars import php_format_to_java

    compilable, rejected = [], []
    for f in fmts:
        try:
            php_format_to_java(f)
            compilable.append(f)
        except ValueError:
            rejected.append(f)
    assert any("dd" in f or "YY" in f or "Yy" in f for f in rejected) or rejected

    df = spark.createDataFrame([(i, s) for i, s in enumerate(stamps)], "i int, ts timestamp")
    mismatches = []
    for lo in range(0, len(compilable), 40):
        chunk = compilable[lo : lo + 40]
        out = df.select(
            "i", *[date_format_php(F.col("ts"), f).alias(f"f{j}") for j, f in enumerate(chunk)]
        ).collect()
        for row in out:
            ts = stamps[row.i]
            for j, f in enumerate(chunk):
                want = ts.strftime(php_format_to_strftime(f))
                got = row[f"f{j}"]
                if got != want:
                    mismatches.append((f, ts.isoformat(), want, got))
    assert not mismatches, mismatches[:8]


def test_numeric_cast_compiled_vs_python_fuzz(spark):
    """String->Int/Float cast parity across the two execution paths,
    pinned to Go strconv acceptance: whitespace-padded, underscore-
    grouped, unicode-digit, overflow, inf/nan, hex and plain forms.
    py_cast raising CastError must correspond exactly to the strict
    column casts yielding NULL, and accepted values must agree."""
    from pyspark.sql import functions as F

    from vanus_spark.casts import CastError, col_to_float, col_to_int, py_cast

    vals = [
        "12", " 12 ", "12 ", " 12", "1_0", "+5", "-7", "12.5", "-0",
        "١٢", "0x10", "1e3", "1E-2", "inf", "Inf", "Infinity",
        "-Infinity", "nan", "NaN", "1.", ".", ".5", "1_000.5",
        "9223372036854775807", "9223372036854775808",
        "-9223372036854775808", "-9223372036854775809",
        "1e999", "-1e999", "1e-999", "", "+", "-", "e5", "5e", "2.5e2",
        "0005", "+inf", "tRuE", "½",
    ]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, s string")
    out = {
        r.i: (r.l, r.d)
        for r in df.select(
            "i",
            col_to_int(F.col("s")).alias("l"),
            col_to_float(F.col("s")).alias("d"),
        ).collect()
    }
    import math as _math

    bad = []
    for i, v in enumerate(vals):
        want_l: object
        try:
            want_l = py_cast(v, "int")
        except CastError:
            want_l = None
        try:
            want_f = py_cast(v, "float")
        except CastError:
            want_f = None
        got_l, got_f = out[i]
        same_f = (
            got_f == want_f
            or (got_f is not None and want_f is not None
                and _math.isnan(got_f) and _math.isnan(want_f))
        )
        if got_l != want_l or not same_f:
            bad.append((v, want_l, got_l, want_f, got_f))
    assert not bad, bad


# --- round-8 frozen-walk kernels ---

@given(
    st.integers(min_value=0, max_value=25),
    st.integers(min_value=0, max_value=25),
    st.integers(min_value=0, max_value=25),
    st.integers(min_value=0, max_value=25),
)
@settings(max_examples=150, deadline=None)
def test_fisher_walk_matches_exact_rationals(a, b, c, d):
    """The frozen-order float walk agrees with the EXACT rational
    hypergeometric computation (Fraction + math.comb) to float
    precision, for every small 2x2 table with non-degenerate
    margins."""
    import math
    from fractions import Fraction

    from vanus_spark.operators.hyptests import fisher_exact_2x2

    r1, r2, c1 = a + b, c + d, a + c
    n = r1 + r2
    if r1 == 0 or r2 == 0 or c1 == 0 or c1 == n:
        return  # degenerate margins: the test is undefined
    got = fisher_exact_2x2(a, b, c, d)["p_value"]
    kmin, kmax = max(0, c1 - r2), min(r1, c1)
    pmf = {
        k: Fraction(math.comb(r1, k) * math.comb(r2, c1 - k),
                    math.comb(n, c1))
        for k in range(kmin, kmax + 1)
    }
    # same membership convention: P(k) <= P(a) * (1 + 1e-7); at exact
    # rationals the slack only matters for exact ties, which Fraction
    # handles exactly
    thresh = pmf[a] * Fraction(10000001, 10000000)
    want = float(sum(p for p in pmf.values() if p <= thresh))
    assert abs(got - want) < 1e-9


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=15,
    )
)
@settings(max_examples=100, deadline=None)
def test_stationary_is_invariant_and_simplex(edges):
    """For any 3-state chain where every state has out-flow, the
    50-sweep result lies on the simplex and satisfies pi P = pi to
    convergence tolerance."""
    from vanus_spark.operators.markov import stationary_distribution

    states = ["s0", "s1", "s2"]
    counts = [(f"s{i}", f"s{j}", c) for i, j, c in edges]
    out_flow = {s: 0 for s in states}
    for s_, d_, c_ in counts:
        out_flow[s_] += c_
    if any(v == 0 for v in out_flow.values()):
        return
    pi = dict(stationary_distribution(counts, states))
    assert abs(sum(pi.values()) - 1.0) < 1e-9
    assert all(v >= -1e-15 for v in pi.values())
    # build P and check invariance loosely (power iteration on a
    # possibly-periodic chain may oscillate; accept either the fixed
    # point or a small residual)
    mat = {(s, d): 0 for s in states for d in states}
    for s_, d_, c_ in counts:
        mat[(s_, d_)] += c_
    p = {
        (s, d): mat[(s, d)] / out_flow[s]
        for s in states
        for d in states
    }
    res = 0.0
    for d_ in states:
        nxt = sum(pi[s_] * p[(s_, d_)] for s_ in states)
        res = max(res, abs(nxt - pi[d_]))
    # aperiodic chains converge tightly; allow slack for periodic ones
    assert res < 0.51


def test_drawdown_prefix_identity(spark):
    """The SHIPPED max_drawdown operator must equal the brute-forced
    Python identity max over t of (max prefix sum up to t) - (prefix
    sum at t) on random integer series. 40 random cases become 40
    keys in ONE DataFrame, so the whole sweep is a single Spark job
    over the operator's real window-plus-aggregate plan."""
    import random as _random

    from vanus_spark.operators.timeseries import max_drawdown

    rng = _random.Random(20260816)
    cases = [
        [rng.randint(-1000, 1000) for _ in range(rng.randint(1, 40))]
        for _ in range(40)
    ]
    rows = [
        (k, t, t, c)
        for k, cents in enumerate(cases)
        for t, c in enumerate(cents)
    ]
    df = spark.createDataFrame(
        rows, "k int, ts long, event_id long, cents long"
    )
    got = {
        r["k"]: (
            r["max_drawdown_cents"],
            r["peak_cents"],
            r["final_cents"],
        )
        for r in max_drawdown(df, "cents", "ts", "k", "event_id").collect()
    }
    for k, cents in enumerate(cases):
        prefix, peak, best = 0, -(10**18), 0
        for c in cents:
            prefix += c
            peak = max(peak, prefix)
            best = max(best, peak - prefix)
        assert got[k] == (best, peak, prefix), f"case {k}: {cents}"


def test_ks_two_sample_matches_brute_force_randomized(spark):
    """The two-phase-prefix KS statistic must equal the O(n^2)-naive
    sup|ECDF_a - ECDF_b| over random integer samples — 20 random
    cases driven through the shipped operator one by one would cost
    20 Spark jobs, so the cases batch as distinct value OFFSETS in
    one frame and the operator runs per offset slice via a loop over
    collected sub-frames."""
    import random as _random

    from vanus_spark.operators.hyptests import ks_two_sample

    rng = _random.Random(20260816)
    for case in range(6):
        na, nb = rng.randint(2, 60), rng.randint(2, 60)
        a = [rng.randint(0, 12) for _ in range(na)]
        b = [rng.randint(0, 12) for _ in range(nb)]
        df = spark.createDataFrame(
            [(v, 0) for v in a] + [(v, 1) for v in b], "v int, grp int"
        )
        got = ks_two_sample(df, "v", "grp").collect()[0]
        support = sorted(set(a) | set(b))
        d = max(
            abs(
                sum(1 for x in a if x <= s) / na
                - sum(1 for x in b if x <= s) / nb
            )
            for s in support
        )
        assert abs(got["d_stat"] - round(d, 6)) < 2e-6, (case, a, b)


def test_acf_exact_matches_brute_force_randomized(spark):
    """acf_exact's moment-assembled r_k must equal the textbook
    definition sum((y_t-m)(y_{t-k}-m))/sum((y_t-m)^2) on random
    integer series — 8 random keys in ONE DataFrame."""
    import random as _random

    from datetime import date, timedelta

    from vanus_spark.operators.timeseries import acf_exact

    rng = _random.Random(7)
    cases = {
        k: [rng.randint(-50, 50) for _ in range(rng.randint(5, 40))]
        for k in range(8)
    }
    rows = [
        (k, date(2024, 1, 1) + timedelta(days=i), v)
        for k, ys in cases.items()
        for i, v in enumerate(ys)
    ]
    df = spark.createDataFrame(rows, "k int, day date, cents long")
    got = {r["k"]: r for r in acf_exact(df, "k", "day", "cents", 3).collect()}
    for k, ys in cases.items():
        n = len(ys)
        m = sum(ys) / n
        denom = sum((y - m) ** 2 for y in ys)
        for lag in (1, 2, 3):
            want = (
                sum((ys[t] - m) * (ys[t - lag] - m) for t in range(lag, n))
                / denom
                if denom > 0
                else None
            )
            gotv = got[k][f"acf_{lag}"]
            if want is None:
                assert gotv is None
            else:
                assert abs(gotv - round(want, 6)) < 2e-6, (k, lag)


def test_quantile_regression_matches_brute_force(spark):
    """The SHIPPED events_quantile_regression must pick, for every
    random series and every tau, the SAME vertex (by its loss/dx sort
    key with (i,j) tie-break) as a brute-force Python enumeration of
    all point pairs. 12 random daily series become 12 event types in
    ONE events frame, so the whole sweep runs the operator's real
    cross+window plan once."""
    import importlib.util
    import os
    import random as _random
    import tempfile

    spec = importlib.util.spec_from_file_location(
        "__spark_entry_qr__", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    rng = _random.Random(20260817)
    cases = {
        f"t{k:02d}": [rng.randint(0, 500) for _ in range(rng.randint(3, 12))]
        for k in range(12)
    }
    rows = []
    eid = 0
    for typ, cents in cases.items():
        for d, c in enumerate(cents, start=1):
            rows.append(
                (eid, f"2024-01-{d:02d}T12:00:00", 1, typ, c / 100.0, None)
            )
            eid += 1
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    tmp = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))

    def brute(cents, tau100):
        best = None
        n = len(cents)
        for i in range(1, n + 1):
            for j in range(i + 1, n + 1):
                yi, yj = cents[i - 1], cents[j - 1]
                dx, dy = j - i, yj - yi
                l100 = 0
                for d in range(1, n + 1):
                    r = dx * (cents[d - 1] - yi) - (d - i) * dy
                    l100 += max(tau100 * r, (tau100 - 100) * r)
                key = (l100 / dx, i, j)
                if best is None or key < best[0]:
                    best = (key, dx, dy, yi, i, l100, n)
        key, dx, dy, yi, i, l100, n = best
        return (
            round(dy / (100.0 * dx), 6),
            round((dx * yi - i * dy) / (100.0 * dx), 6),
            round(l100 / (100.0 * dx * 100.0 * n), 6),
        )

    got = {
        (r["event_type"], round(r["tau"], 2)): (
            r["slope"],
            r["intercept"],
            r["mean_check_loss"],
        )
        for r in m.queries()["events_quantile_regression"](
            spark, tmp
        ).collect()
    }
    for typ, cents in cases.items():
        for tau100 in (25, 50, 75):
            assert got[(typ, tau100 / 100)] == brute(cents, tau100), (
                typ,
                tau100,
                cents,
            )
