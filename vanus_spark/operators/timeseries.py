"""Time-series smoothing operators over event streams.

``ewma`` — exponentially weighted moving average per key, the standard
smoothing primitive for metric streams (anomaly baselines, rate
dashboards). Spark has no EWMA builtin; the recursive definition
s_i = a*x_i + (1-a)*s_{i-1} is not a closed-form window aggregate, so
this implements it as a BOUNDED-window left fold: collect the last
``k`` values per row (one window, frame order = event order) and fold
them with ``F.aggregate`` — pure Catalyst HOF, no Python at eval time.

Bounding the lookback at ``k`` is also the numerically honest form:
the dropped tail's weight is (1-a)^k (2^-32 at the defaults), below
double precision, while an UNBOUNDED fold would make every row's cost
O(history). One shuffle (the window's key partitioning); within a
partition the frame slides — the same profile at 100 TB as any
per-key window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def ewma(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    key_col: str,
    order_tiebreak: str,
    alpha: float = 0.5,
    k: int = 32,
    out_col: str = "ewma",
) -> DataFrame:
    """df + ``out_col``: the EWMA of the last ``k`` values of
    ``value_col`` per ``key_col``, in (ts, tiebreak) order; the fold
    is seeded with the OLDEST value in the frame (so a key's first row
    has ewma = its own value). alpha = 0.5 by default: powers of two
    are exact doubles, so independent engines folding the same frame
    agree bit-for-bit."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, order_tiebreak)
        .rowsBetween(-(k - 1), 0)
    )
    arr = F.collect_list(F.col(value_col).cast("double")).over(w)
    staged = df.withColumn("_ewma_arr", arr)
    rest = F.slice(
        F.col("_ewma_arr"),
        F.lit(2),
        F.greatest(F.size("_ewma_arr") - 1, F.lit(0)),
    )
    folded = F.aggregate(
        rest,
        F.element_at("_ewma_arr", 1),
        lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc,
    )
    return staged.withColumn(out_col, folded).drop("_ewma_arr")


def gapfill(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    step: str = "1 hour",
    bucket_fn: str = "hour",
) -> DataFrame:
    """Regularize a sparse per-key series onto a dense time grid with
    forward fill (the dashboard/feature-store resampling primitive
    Spark lacks as a builtin).

    Per key: bucket events to ``bucket_fn`` granularity (max value per
    bucket — an exact aggregate, no float-order sensitivity), build the
    dense spine from the key's own min..max bucket via
    ``sequence``+``explode``, left-join the actuals, and carry the last
    non-null value forward with one per-key ordered window
    (``last(..., ignorenulls=True)``).

    Returns (key, bucket, value_filled, filled) where ``filled`` marks
    grid rows that had no observation.

    Scale: two shuffles total (bucket aggregate, per-key window — AQE
    coalesces them onto the same key partitioning); the spine explode
    is bounded by the key's time span / step, generated executor-side,
    never a driver-side range. Skewed keys (one key spanning years at
    second granularity) bound their own cost: the spine is per-key
    min..max, not a global calendar cross join.
    """
    bucket = F.date_trunc(bucket_fn, F.col(ts_col)).alias("bucket")
    actual = df.groupBy(F.col(key_col), bucket).agg(
        F.max(value_col).alias("_v")
    )
    spine = (
        actual.groupBy(key_col)
        .agg(F.min("bucket").alias("_mn"), F.max("bucket").alias("_mx"))
        .select(
            key_col,
            F.explode(
                F.sequence("_mn", "_mx", F.expr(f"INTERVAL {step}"))
            ).alias("bucket"),
        )
    )
    joined = spine.join(actual, [key_col, "bucket"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        key_col,
        "bucket",
        F.last("_v", ignorenulls=True).over(w).alias("value_filled"),
        F.col("_v").isNull().alias("filled"),
    )


def cusum(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    key_col: str,
    order_tiebreak: str,
    target: float,
    slack: float = 0.0,
    threshold: float = 0.0,
    out_col: str = "cusum",
) -> DataFrame:
    """One-sided CUSUM change detection per key: the classic recursion
    s_i = max(0, s_{i-1} + (x_i - target - slack)) flags sustained
    upward mean shifts when s_i exceeds ``threshold``.

    The recursion LOOKS inherently sequential, but it has an exact
    closed form over prefix aggregates:

        s_i = P_i - min(0, min_{j<=i} P_j)   where P = cumsum(x - target - slack)

    so it compiles to two ordered per-key window aggregates (running
    sum, then running min of that sum) — pure built-ins, whole-stage
    codegen, ONE shuffle (the key partitioning), full history with no
    truncated lookback. Both engines fold the prefix sum in the same
    deterministic frame order, so values agree bit-for-bit.

    Adds ``out_col`` (the CUSUM statistic) and ``out_col + '_alarm'``.
    """
    drift = F.col(value_col) - F.lit(target) - F.lit(slack)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(order_tiebreak))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = F.sum(drift).over(w)
    df2 = df.withColumn("_p", p)
    w2 = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(order_tiebreak))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = F.col("_p") - F.least(F.lit(0.0), F.min("_p").over(w2))
    return (
        df2.withColumn(out_col, s)
        .withColumn(out_col + "_alarm", F.col(out_col) > F.lit(threshold))
        .drop("_p")
    )


def interpolate_linear(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    step: str = "1 hour",
    bucket_fn: str = "hour",
) -> DataFrame:
    """``gapfill``'s sibling with LINEAR interpolation: missing grid
    buckets get pv + (nv - pv) * (t - pt)/(nt - pt) between the
    previous and next observed buckets (sensor/metric resampling where
    a step function misstates trends).

    Same dense-spine construction as ``gapfill`` (per-key min..max, so
    every interior gap has both neighbors); the previous/next carries
    are ONE ordered window each over the same key partitioning —
    still two shuffles total. The arithmetic is a single IEEE
    expression over integer second offsets, so an independent SQL
    engine reproduces it bit-for-bit.

    Returns (key, bucket, value_interp, filled).
    """
    bucket = F.date_trunc(bucket_fn, F.col(ts_col)).alias("bucket")
    actual = df.groupBy(F.col(key_col), bucket).agg(
        F.max(value_col).alias("_v")
    )
    spine = (
        actual.groupBy(key_col)
        .agg(F.min("bucket").alias("_mn"), F.max("bucket").alias("_mx"))
        .select(
            key_col,
            F.explode(
                F.sequence("_mn", "_mx", F.expr(f"INTERVAL {step}"))
            ).alias("bucket"),
        )
    )
    joined = spine.join(actual, [key_col, "bucket"], "left")
    wb = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_bucket = F.when(F.col("_v").isNotNull(), F.col("bucket"))
    pv = F.last("_v", ignorenulls=True).over(wb)
    pt = F.last(obs_bucket, ignorenulls=True).over(wb)
    nv = F.first("_v", ignorenulls=True).over(wf)
    nt = F.first(obs_bucket, ignorenulls=True).over(wf)
    frac = (
        (F.unix_timestamp("bucket") - F.unix_timestamp(pt)).cast("double")
        / (F.unix_timestamp(nt) - F.unix_timestamp(pt)).cast("double")
    )
    interp = F.when(F.col("_v").isNotNull(), F.col("_v")).otherwise(
        pv + (nv - pv) * frac
    )
    return joined.select(
        key_col,
        "bucket",
        interp.alias("value_interp"),
        F.col("_v").isNull().alias("filled"),
    )


def changepoint_binary(
    series: DataFrame,
    key_col: str = "key",
    t_col: str = "t",
    val_col: str = "v",
) -> DataFrame:
    """Single-changepoint detection by binary segmentation (the first
    split of the classic CUSUM/binary-segmentation family): per key,
    the split position i maximizing |mean_left - mean_right| *
    sqrt(i*(n-i)/n) over the time-ordered series — the scaled
    mean-shift statistic whose argmax is the most likely level change.

    Shape: one cumulative-sum window per key (Spark's range-bounded
    running sum — the series is pre-bucketed by the caller, so rows
    per key are bounded), one per-key total, one bounded argmax
    window. The statistic is a fixed-order double expression over
    exact sums; ties break to the earliest split via
    (round(stat, 9) DESC, t) so ranking is deterministic cross-engine.

    Returns (key, split_t, n_points, stat, mean_left, mean_right):
    the last bucket of the left segment, the point count, and the
    segment means (round(6))."""
    w = Window.partitionBy(key_col).orderBy(t_col)
    wall = Window.partitionBy(key_col)
    cum = (
        series.withColumn("_i", F.row_number().over(w))
        .withColumn("_s", F.sum(val_col).over(w))
        .withColumn("_n", F.count("*").over(wall))
        .withColumn("_tot", F.sum(val_col).over(wall))
    )
    i = F.col("_i").cast("double")
    n = F.col("_n").cast("double")
    mean_l = F.col("_s") / i
    mean_r = (F.col("_tot") - F.col("_s")) / (n - i)
    stat = F.abs(mean_l - mean_r) * F.sqrt(i * (n - i) / n)
    scored = cum.where(F.col("_i") < F.col("_n")).select(
        key_col,
        F.col(t_col).alias("split_t"),
        F.col("_n").alias("n_points"),
        stat.alias("_stat"),
        mean_l.alias("_ml"),
        mean_r.alias("_mr"),
    )
    pick = Window.partitionBy(key_col).orderBy(
        F.desc(F.round("_stat", 9)), F.asc("split_t")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(pick))
        .where(F.col("_rk") == 1)
        .select(
            key_col,
            "split_t",
            "n_points",
            F.round("_stat", 6).alias("stat"),
            F.round("_ml", 6).alias("mean_left"),
            F.round("_mr", 6).alias("mean_right"),
        )
    )


def theil_sen(
    df: DataFrame,
    value_col: str,
    time_col: str,
    key_col: str,
    id_col: str,
) -> DataFrame:
    """Theil-Sen robust trend per key: the MEDIAN of all pairwise
    slopes (value diff / time diff) — up to ~29% of the points can be
    arbitrary outliers before the estimate moves, where the OLS slope
    (regr_slope) follows a single bad point.

    ``time_col`` must already be numeric (caller converts timestamps;
    whole seconds keep cross-engine parity). Equal-time pairs are
    excluded (undefined slope). Returns (key, n_pairs, theil_slope).

    Scale shape: the pair join is per-key (one key-partitioned
    shuffle), quadratic only in each key's OWN row count — the same
    per-entity bound sessionization assumes; median is the exact
    built-in. For keys with unbounded history, window the input first
    (the estimator is conventionally run per bounded period anyway).
    """
    a = df.alias("a")
    b = df.alias("b")
    pairs = a.join(
        b,
        (F.col(f"a.{key_col}") == F.col(f"b.{key_col}"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        & (F.col(f"a.{time_col}") != F.col(f"b.{time_col}")),
    ).select(
        F.col(f"a.{key_col}").alias(key_col),
        (
            (F.col(f"b.{value_col}") - F.col(f"a.{value_col}"))
            / (F.col(f"b.{time_col}") - F.col(f"a.{time_col}"))
        ).alias("slope"),
    )
    return pairs.groupBy(key_col).agg(
        F.count("*").alias("n_pairs"),
        # +0.0 canonicalizes IEEE -0.0 so engines stringify identically
        (F.round(F.median("slope"), 6) + F.lit(0.0)).alias("theil_slope"),
    )


def holt_winters(
    daily: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
    period: int = 7,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.25,
) -> DataFrame:
    """Additive Holt-Winters (triple exponential smoothing) per key,
    folded entirely in Catalyst — level/trend/seasonal state walks the
    series inside ONE ``F.aggregate`` higher-order function, no Python
    at eval time and no per-step shuffle (the EWMA module's design,
    extended to vector state: the accumulator is a struct carrying the
    seasonal array, updated positionally with an indexed transform).

    ``daily`` must hold one row per (key, day) with an EXACT-INTEGER
    metric (``value_col`` as cents): the init moments then fold from
    exact longs, so both engines enter the recursion with identical
    doubles and every subsequent step is the same IEEE op sequence —
    the DuckDB oracle replays the recursion as a recursive CTE and
    hash-matches at round(6).

    Init (standard 2-period bootstrap; keys with < 2*period points are
    dropped): level = sum(first period)/p, trend = (sum(second period)
    - sum(first period))/p^2, seasonal_i = y_i - level. One row per
    (key, horizon 1..period): the h-step forecast level + h*trend +
    season[(n-1+h) mod p], with the final level/trend and the
    in-sample one-step SSE repeated per key.

    Scale: one partial-agg shuffle to the daily grain, one
    collect_list per key bounded by the CALENDAR (a #days array per
    key — the same boundedness as any per-key series operator), fold
    and forecast map-side after that.
    """
    p = period
    grams = daily.groupBy(key_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(day_col), F.col(value_col)))
        ).alias("_pairs")
    )
    ys = F.transform(F.col("_pairs"), lambda s: s[value_col].cast("double"))
    series = grams.select(
        key_col,
        ys.alias("_y"),
        F.size("_pairs").alias("n_days"),
    ).where(F.col("n_days") >= 2 * p)

    sum1 = F.aggregate(
        F.slice("_y", 1, p), F.lit(0.0), lambda a, x: a + x
    )
    sum2 = F.aggregate(
        F.slice("_y", p + 1, p), F.lit(0.0), lambda a, x: a + x
    )
    lvl0 = sum1 / float(p)
    tr0 = (sum2 - sum1) / float(p * p)
    seas0 = F.transform(
        F.slice("_y", 1, p), lambda y: y - F.col("_lvl0")
    )
    init = series.withColumn("_lvl0", lvl0).select(
        key_col,
        "n_days",
        "_y",
        F.struct(
            F.col("_lvl0").alias("lvl"),
            tr0.alias("tr"),
            seas0.alias("seas"),
            F.lit(0.0).alias("sse"),
            F.lit(p).alias("t"),
        ).alias("_acc0"),
    )

    def step(acc, y):
        pos = acc["t"] % p
        sold = F.element_at(acc["seas"], pos + 1)
        fitted = acc["lvl"] + acc["tr"] + sold
        lvl_n = alpha * (y - sold) + (1 - alpha) * (acc["lvl"] + acc["tr"])
        tr_n = beta * (lvl_n - acc["lvl"]) + (1 - beta) * acc["tr"]
        s_n = gamma * (y - lvl_n) + (1 - gamma) * sold
        seas_n = F.transform(
            acc["seas"],
            lambda s, i: F.when(i == pos, s_n).otherwise(s),
        )
        return F.struct(
            lvl_n.alias("lvl"),
            tr_n.alias("tr"),
            seas_n.alias("seas"),
            (acc["sse"] + (y - fitted) * (y - fitted)).alias("sse"),
            (acc["t"] + 1).alias("t"),
        )

    folded = init.select(
        key_col,
        "n_days",
        F.aggregate(
            F.slice("_y", p + 1, F.size("_y") - p), F.col("_acc0"), step
        ).alias("_acc"),
    )
    h = F.explode(F.sequence(F.lit(1), F.lit(p))).alias("h")
    out = folded.select(key_col, "n_days", "_acc", h)
    fc = (
        F.col("_acc")["lvl"]
        + F.col("h") * F.col("_acc")["tr"]
        + F.element_at(
            F.col("_acc")["seas"],
            ((F.col("n_days") - 1 + F.col("h")) % p) + 1,
        )
    )
    return out.select(
        key_col,
        "n_days",
        "h",
        F.round(fc, 6).alias("forecast"),
        F.round(F.col("_acc")["lvl"], 6).alias("level"),
        F.round(F.col("_acc")["tr"], 6).alias("trend"),
        F.round(F.col("_acc")["sse"], 6).alias("sse"),
    )


def mann_kendall(
    daily: DataFrame,
    key_col: str,
    idx_col: str,
    value_col: str,
) -> DataFrame:
    """Mann-Kendall monotonic-trend test per key — the nonparametric
    "is this series drifting" check (no linearity or normality
    assumption; the significance sibling of theil_sen's slope):
    S = sum over ordered pairs of sign(y_j - y_i), tie-corrected
    variance (n(n-1)(2n+5) - sum t(t-1)(2t+5))/18, and the
    continuity-corrected z ((S-1)/sd if S>0, (S+1)/sd if S<0, else
    0). ``value_col`` must be exact-lattice (integer cents): S and
    both variance terms are then exact integers, so z is the same
    IEEE expression on both engines.

    Scale: the pair self-join runs over the per-key SERIES table
    (#days rows per key — bounded by the calendar, same argument as
    holt_winters), key-partitioned; the data itself is touched once
    by whatever daily aggregate builds ``daily``."""
    a = daily.select(
        F.col(key_col),
        F.col(idx_col).alias("_ti"),
        F.col(value_col).alias("_yi"),
    )
    b = daily.select(
        F.col(key_col),
        F.col(idx_col).alias("_tj"),
        F.col(value_col).alias("_yj"),
    )
    pairs = a.join(b, key_col).where(F.col("_ti") < F.col("_tj"))
    s_df = pairs.groupBy(key_col).agg(
        F.sum(F.signum(F.col("_yj") - F.col("_yi")).cast("long")).alias(
            "s_stat"
        )
    )
    ties = daily.groupBy(key_col, value_col).agg(F.count("*").alias("_t"))
    tie_df = ties.groupBy(key_col).agg(
        F.sum("_t").alias("n_obs"),
        F.sum(
            F.col("_t") * (F.col("_t") - 1) * (2 * F.col("_t") + 5)
        ).alias("_tie_term"),
    )
    j = s_df.join(tie_df, key_col)
    n = F.col("n_obs")
    var_s = (
        n * (n - 1) * (2 * n + 5) - F.col("_tie_term")
    ).cast("double") / 18.0
    sd = F.sqrt(var_s)
    s = F.col("s_stat")
    z = (
        F.when((s > 0) & (var_s > 0), (s - 1).cast("double") / sd)
        .when((s < 0) & (var_s > 0), (s + 1).cast("double") / sd)
        .otherwise(F.lit(0.0))
    )
    return j.select(
        key_col,
        "n_obs",
        "s_stat",
        F.round(var_s, 6).alias("var_s"),
        F.round(z, 6).alias("z"),
    )


def decompose_additive(
    daily: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
    period: int = 7,
) -> DataFrame:
    """Classical additive seasonal decomposition (the moving-average
    method behind STL's initialization; Kendall & Stuart):
    trend = centered ``period``-point moving average (full windows
    only), seasonal = per-phase mean of the detrended series
    re-centered to sum to zero over one period, residual = the rest.

    Scale shape: runs entirely on the DAILY table (#keys x #days
    rows — the caller owns the one collapse from raw events), windows
    partitioned per key. Day phases come from dayofweek so the
    seasonal index is calendar-stable. Integer-cents values divide
    only at the mean steps, so both engines derive identical doubles.

    Only period=7 is supported: the centered window rowsBetween(-half,
    half) spans period+1 rows for EVEN periods (so the count==period
    full-window test would select off-center truncated edge windows),
    and the dayofweek phase is only meaningful on a weekly cycle.
    """
    if period != 7:
        raise ValueError(
            "decompose_additive supports period=7 only: even periods "
            "break the centered-window full-window test and the "
            "dayofweek phase assumes a weekly cycle"
        )
    half = period // 2
    w_ma = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(-half, half)
    )
    # the moving sum stays in the integer domain (callers pass cents),
    # so the trend is a single exact-int / period division — immune to
    # float summation-order differences between engines
    staged = daily.select(
        key_col,
        day_col,
        F.col(value_col).cast("double").alias("_y"),
        F.when(
            F.count(value_col).over(w_ma) == period,
            F.sum(value_col).over(w_ma).cast("double") / float(period),
        ).alias("_trend"),
        F.dayofweek(day_col).alias("_phase"),
    ).withColumn("_detr", F.col("_y") - F.col("_trend"))
    # per-phase means on a (#keys x period)-row dim, re-centered so
    # the seasonal indexes sum to zero with EQUAL phase weight (the
    # classical convention; a row-weighted window avg would skew it
    # when phases have unequal counts at the series edges)
    phase_means = staged.groupBy(key_col, "_phase").agg(
        F.avg("_detr").alias("_smean")
    )
    w_key = Window.partitionBy(key_col)
    seasonal = phase_means.select(
        key_col,
        "_phase",
        (F.col("_smean") - F.avg("_smean").over(w_key)).alias("_seas_raw"),
    )
    # equi-join back on (key, phase); AQE broadcasts the dim when the
    # key cardinality is small — no forced hint, since the dim is
    # #keys x period rows and keys may be high-cardinality
    with_season = staged.join(seasonal, [key_col, "_phase"])
    return with_season.select(
        key_col,
        day_col,
        F.round("_y", 6).alias("value"),
        F.round("_trend", 6).alias("trend"),
        F.round("_seas_raw", 6).alias("seasonal"),
        F.round(
            F.col("_y") - F.col("_trend") - F.col("_seas_raw"), 6
        ).alias("residual"),
    )


def max_drawdown(
    df: DataFrame,
    cents_col: str,
    ts_col: str,
    key_col: str,
    order_tiebreak: str,
) -> DataFrame:
    """Per-key maximum drawdown of the cumulative ``cents_col`` curve
    (the risk readout a metrics platform runs on any cumulative KPI —
    "how far below its own high-water mark did this series fall"):
    equity = running sum, drawdown = running max(equity) - equity,
    answer = max drawdown per key.

    Scale shape: one key-partitioned window (running sum and running
    max share the same frame, one shuffle) then a per-key aggregate
    with map-side combine. Everything stays on the exact BIGINT cents
    lattice — the running max of a prefix sum is order-sensitive, so
    the frame orders by (ts, tiebreak) and both engines walk identical
    integers."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, order_tiebreak)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    equity = F.sum(cents_col).over(w)
    staged = df.select(
        key_col,
        F.col(cents_col).alias("_c"),
        equity.alias("_eq"),
        F.max(equity).over(w).alias("_peak"),
    )
    # final equity = the running sum at the last row = the plain total,
    # an order-free aggregate (never F.last, whose groupBy order is
    # nondeterministic)
    return staged.groupBy(key_col).agg(
        F.count("*").alias("n_events"),
        F.max(F.col("_peak") - F.col("_eq")).alias("max_drawdown_cents"),
        F.max("_eq").alias("peak_cents"),
        F.sum("_c").alias("final_cents"),
    )


def acf_exact(
    daily: DataFrame,
    key_col: str,
    day_col: str,
    cents_col: str,
    max_lag: int,
) -> DataFrame:
    """Autocorrelation function r_1..r_max_lag per key over a DAILY
    integer series (the seasonality/memory diagnostic behind lag
    selection and Ljung-Box): r_k = sum((y_t - m)(y_{t-k} - m)) /
    sum((y_t - m)^2) with the full-series mean m.

    Exactness: every aggregate is an exact integer — the QUADRATIC
    terms (sum y_t^2 and the per-lag cross products sum y_t * y_{t-k})
    accumulate in DECIMAL(38,0) (the supplier_hhi/waterfall lattice
    discipline; the oracle twin sums in HUGEINT), the linear sums in
    BIGINT — and r_k is assembled from them in ONE fixed scalar
    expression, so both engines derive identical doubles. Overflow
    headroom is now n * max_cents^2 < 1e38 (vs the old int64 9.2e18,
    where Spark 4 ANSI threw while DuckDB silently summed in HUGEINT
    — a latent cross-engine divergence past ~1e5-cent days x 1e8
    rows).

    Scale shape: runs on the DAILY table (#keys x #days — the caller
    owns the one collapse from raw events); ONE key-partitioned
    window computes all ``max_lag`` lag columns, then one map-side
    combined aggregate emits a #keys-row table. Returns one row per
    key with n_days plus acf_1..acf_{max_lag}."""
    w = Window.partitionBy(key_col).orderBy(day_col)
    y = F.col(cents_col)
    lagged = daily.select(
        key_col,
        y.alias("_y"),
        *[F.lag(y, k).over(w).alias(f"_l{k}") for k in range(1, max_lag + 1)],
    )
    ydec = F.col("_y").cast("decimal(19,0)")
    aggs = [
        F.count("*").alias("_n"),
        F.sum("_y").alias("_s"),
        F.sum(ydec * ydec).alias("_ss"),
    ]
    for k in range(1, max_lag + 1):
        lk = F.col(f"_l{k}")
        aggs += [
            F.sum(ydec * lk.cast("decimal(19,0)")).alias(f"_syy{k}"),
            F.sum(F.when(lk.isNotNull(), F.col("_y"))).alias(f"_sh{k}"),
            F.sum(lk).alias(f"_st{k}"),
            F.count(lk).alias(f"_nk{k}"),
        ]
    g = lagged.groupBy(key_col).agg(*aggs)
    n = F.col("_n").cast("double")
    mean = F.col("_s").cast("double") / n
    denom = F.col("_ss").cast("double") - n * mean * mean
    out_cols = [F.col(key_col), F.col("_n").alias("n_days")]
    for k in range(1, max_lag + 1):
        num = (
            F.col(f"_syy{k}").cast("double")
            - mean * (F.col(f"_sh{k}") + F.col(f"_st{k}")).cast("double")
            + F.col(f"_nk{k}").cast("double") * mean * mean
        )
        out_cols.append(
            F.round(F.when(denom > 0, num / denom), 6).alias(f"acf_{k}")
        )
    return g.select(*out_cols)


def ljung_box(
    daily: DataFrame,
    key_col: str,
    day_col: str,
    cents_col: str,
    h: int,
) -> DataFrame:
    """Ljung-Box portmanteau test per key ("is this daily series
    white noise?"): Q = n(n+2) * sum_{k=1..h} r_k^2/(n-k) over the
    exact-integer ACF, with the chi-square(h) upper tail via the
    Wilson-Hilferty cube-root normal approximation (documented
    approximation — exact chi2 tails for arbitrary dof have no closed
    form; the z it produces feeds the same shared A&S normal-tail
    polynomial both engines already use). Runs entirely on acf_exact's
    #keys-row output."""
    from .hyptests import norm_sf

    acf = acf_exact(daily, key_col, day_col, cents_col, h)
    n = F.col("n_days").cast("double")
    q = F.lit(0.0)
    for k in range(1, h + 1):
        rk = F.col(f"acf_{k}")
        q = q + rk * rk / (n - float(k))
    q = n * (n + 2.0) * q
    hh = float(h)
    # Wilson-Hilferty: (Q/h)^(1/3) ~ N(1 - 2/(9h), 2/(9h))
    z = (F.cbrt(q / hh) - (1.0 - 2.0 / (9.0 * hh))) / F.sqrt(
        F.lit(2.0 / (9.0 * hh))
    )
    return acf.select(
        key_col,
        "n_days",
        F.round(q, 6).alias("q_stat"),
        F.round(norm_sf(z), 6).alias("p_value"),
    )
