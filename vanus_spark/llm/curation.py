"""Corpus curation operators a large-scale training-data pipeline
needs beyond dedup: PII redaction, benchmark-contamination detection,
stratified sampling, and sequence packing.

All four are designed scale-first:

- PII redaction is a pure regexp_replace chain — whole-stage codegen,
  zero shuffle, runs at scan speed.
- Contamination detection is the standard n-gram-overlap check
  (the style of train/test decontamination used for LLM corpora):
  explode test-doc shingles, semi-join against the (much smaller)
  benchmark shingle set — the benchmark side is broadcast, so the
  corpus never shuffles.
- Stratified sampling is hash-gated per stratum: a deterministic
  md5-derived uniform in [0,1) compared to the stratum's rate. No
  shuffle, no RNG state, reproducible across engines and retries
  (sampling by hash is the only repeatable form at 100 TB, where a
  task retry would replay a random generator differently).
- Sequence packing is the concat-then-chunk document packing used to
  fill fixed-size training context windows: a running token total per
  group assigns each document a starting pack id and offset. One
  window per group partition — groups bound partition size, so no
  global single-partition window at any scale.

Hashing note: md5-derived (portable to the DuckDB oracle) like
vanus_spark.llm.dedup; at production scale swap xxhash64 for md5 with
the same structure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from vanus_spark.llm.dedup import bound, md5_long, shingles
from vanus_spark.llm.textstats import whitespace_token_count

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Pattern order matters: SSN before generic phone (both digit runs),
# email before anything that could eat '@'. Each regex is written in
# the common Java-regex/RE2 subset so the DuckDB oracle evaluates the
# identical pattern.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
]


def redact_pii(c: Column) -> Column:
    """Replace every email / IPv4 / SSN / US-phone occurrence with a
    typed placeholder. Pure Column chain (4 regexp_replace), global
    replacement on both engines."""
    out = c
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_report(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, redacted, n_<kind> counts). Counts come from occurrences of
    the placeholder in the redacted text, so they cost no extra regex
    passes beyond the redaction itself."""
    red = redact_pii(F.col(text_col))
    staged = docs.select(F.col(id_col), red.alias("redacted"))
    counts = [
        (
            (F.length("redacted")
             - F.length(F.replace(F.col("redacted"), F.lit(token), F.lit(""))))
            / F.lit(len(token))
        ).cast("long").alias(f"n_{kind}")
        for kind, _, token in PII_PATTERNS
    ]
    return staged.select(F.col(id_col), F.col("redacted"), *counts)


# ---------------------------------------------------------------------------
# benchmark contamination detection
# ---------------------------------------------------------------------------

def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag training documents whose word ``n``-gram sets overlap a
    benchmark set (train/test decontamination).

    Plan shape: benchmark shingles -> distinct -> broadcast;
    corpus shingles -> explode -> broadcast LEFT SEMI join -> count
    per doc. The corpus (the 100 TB side) is never shuffled — the
    only aggregation is the per-doc overlap count, partial-aggregated
    map-side. Returns (id, n_shingles, n_overlap, contamination,
    contaminated)."""
    bench_sh = (
        benchmark.select(F.explode(shingles(f"`{text_col}`", n)).alias("shingle"))
        .distinct()
    )
    doc_sh = docs.select(
        F.col(id_col), F.explode(shingles(f"`{text_col}`", n)).alias("shingle")
    )
    overlap = (
        doc_sh.join(F.broadcast(bench_sh), "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap"))
    )
    totals = docs.select(
        F.col(id_col), F.size(shingles(f"`{text_col}`", n)).alias("n_shingles")
    )
    # coalesce BEFORE the ratio: a doc with no overlapping shingle has
    # contamination 0.0 / false, not null (left-join miss)
    overlap_cnt = F.coalesce(F.col("n_overlap"), F.lit(0))
    frac = overlap_cnt / F.greatest(F.col("n_shingles"), F.lit(1))
    return (
        totals.join(overlap, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_shingles").cast("long").alias("n_shingles"),
            overlap_cnt.cast("long").alias("n_overlap"),
            F.round(frac, 6).alias("contamination"),
            (frac >= threshold).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# stratified deterministic sampling
# ---------------------------------------------------------------------------

def hash_uniform(c: Column, seed: int = 0) -> Column:
    """Deterministic uniform in [0,1): md5-derived hash scaled by its
    actual range — md5_long takes 15 hex digits = 60 bits, so divide
    by 2^60 (2^63 would squash u into [0, 0.125) and over-keep every
    stratum). Engine-portable and replay-stable (same row -> same
    draw on every engine and every task retry)."""
    return md5_long(c, seed) / F.lit(float(1 << 60))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Keep each row with its stratum's probability, decided by a
    deterministic hash of ``key_col`` — the reproducible form of the
    per-source mixing ratios used to compose training corpora.

    No shuffle: the gate is a filter. Rows in strata not listed in
    ``rates`` keep with ``default_rate``."""
    u = hash_uniform(F.col(key_col), seed)
    rate = F.lit(default_rate)
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(r)).otherwise(rate)
    return df.where(u < rate)


# ---------------------------------------------------------------------------
# sequence packing (concat-then-chunk)
# ---------------------------------------------------------------------------

def pack_sequences(
    docs: DataFrame,
    capacity: int,
    group_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each document a (pack_id, pack_offset) inside fixed
    ``capacity``-token context windows, greedy concat-then-chunk: docs
    are laid end-to-end in ``id_col`` order within each ``group_col``
    stream and chunked every ``capacity`` tokens.

    The window partitions by ``group_col`` (a bounded stream — e.g.
    language or source shard), so no single-partition global sort
    exists at any scale; each group's packing is independent and the
    assignment is one running sum per partition. Returns
    (id, group, n_tokens, pack_id, pack_offset, n_packs_spanned)."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = whitespace_token_count(F.col(text_col))
    staged = docs.select(
        F.col(id_col), F.col(group_col), toks.alias("n_tokens")
    )
    cum = F.sum("n_tokens").over(w)
    cum_before = cum - F.col("n_tokens")
    pack_id = F.floor(cum_before / capacity)
    return staged.select(
        F.col(id_col),
        F.col(group_col),
        F.col("n_tokens"),
        pack_id.cast("long").alias("pack_id"),
        (cum_before % capacity).cast("long").alias("pack_offset"),
        (F.floor((cum - 1) / capacity) - pack_id + 1).cast("long").alias("n_packs_spanned"),
    )


# ---------------------------------------------------------------------------
# sliding-window document chunking
# ---------------------------------------------------------------------------

def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap_tokens: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping ``chunk_tokens``-token
    windows (whitespace tokens), stride = chunk - overlap — the
    context-window preparation step of a training/RAG pipeline.

    One narrow projection + explode: zero shuffle at any scale, and
    output partitioning inherits the scan's. The token array is
    lambda-bound (see dedup.bound) so the tokenizer runs once per row.
    Chunk ids are content-independent (md5 of doc id + index) so a
    re-run or a retry emits identical rows. Returns
    (id, chunk_index, n_chunk_tokens, chunk_text, chunk_uid); the
    tail chunk is truncated, never padded, and every token beyond
    position ``overlap`` appears in exactly one non-overlap region.
    """
    if chunk_tokens <= overlap_tokens:
        raise ValueError("chunk_tokens must exceed overlap_tokens")
    stride = chunk_tokens - overlap_tokens
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    chunks = bound(
        toks,
        lambda tk: F.transform(
            F.sequence(
                F.lit(0).cast("long"),
                F.ceil(
                    F.greatest(
                        F.size(tk) - F.lit(overlap_tokens), F.lit(1)
                    ).cast("double")
                    / F.lit(float(stride))
                ).cast("long")
                - 1,
            ),
            lambda k: F.struct(
                k.cast("long").alias("chunk_index"),
                F.least(
                    F.lit(chunk_tokens), F.size(tk) - (k * stride).cast("int")
                ).cast("long").alias("n_chunk_tokens"),
                F.array_join(
                    F.slice(tk, (k * stride + 1).cast("int"), chunk_tokens), " "
                ).alias("chunk_text"),
            ),
        ),
    )
    exploded = docs.select(
        F.col(id_col), F.explode(chunks).alias("ch")
    )
    return exploded.select(
        F.col(id_col),
        F.col("ch.chunk_index").alias("chunk_index"),
        F.col("ch.n_chunk_tokens").alias("n_chunk_tokens"),
        F.col("ch.chunk_text").alias("chunk_text"),
        F.md5(
            F.concat(
                F.col(id_col).cast("string"),
                F.lit(":"),
                F.col("ch.chunk_index").cast("string"),
            )
        ).alias("chunk_uid"),
    )


def exact_stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_col: str,
    seed: int = 0,
) -> DataFrame:
    """EXACTLY ``n_per_stratum`` rows per stratum (fewer only when the
    stratum is smaller), chosen by deterministic hash order of
    ``key_col`` — the eval-set construction primitive: reproducible
    across runs, engines, and retries, unlike rate-based sampling
    whose per-stratum counts fluctuate. One per-stratum window
    (partitioned — parallelism is #strata x hash range, never 1)."""
    u = hash_uniform(F.col(key_col), seed)
    w = Window.partitionBy(strata_col).orderBy(u.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def resample_mixture(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    key_col: str,
    seed: int = 0,
) -> DataFrame:
    """Materialize the largest corpus whose strata follow ``weights``
    exactly (up to floor rounding) WITHOUT upsampling — the data-mixing
    step that turns per-source weights into an actual training corpus.

    The feasible total is capped by whichever stratum runs out first:
    T = min_s floor(n_s / w_s); each stratum then keeps
    k_s = floor(T * w_s) rows in deterministic hash order of
    ``key_col`` (reproducible across runs, engines, and task retries).
    One #strata-row aggregate collect derives the limits; the data
    path is a single per-stratum window — parallelism #strata, no
    second scan. Strata not named in ``weights`` are dropped.
    """
    wsum = sum(weights.values())
    norm = {s: w / wsum for s, w in weights.items() if w > 0}
    counts = {
        r[0]: r[1]
        for r in df.where(F.col(strata_col).isin(*norm))
        .groupBy(strata_col)
        .agg(F.count("*").alias("n"))
        .collect()
    }
    if not counts:
        return df.limit(0)
    total = min(int(counts.get(s, 0) / w) for s, w in norm.items())
    limits = {s: int(total * w) for s, w in norm.items()}
    u = hash_uniform(F.col(key_col), seed)
    win = Window.partitionBy(strata_col).orderBy(u.asc(), F.col(key_col).asc())
    limit = F.lit(0)
    for s, k in sorted(limits.items()):
        limit = F.when(F.col(strata_col) == s, F.lit(k)).otherwise(limit)
    return (
        df.where(F.col(strata_col).isin(*norm))
        .withColumn("_rn", F.row_number().over(win))
        .where(F.col("_rn") <= limit)
        .drop("_rn")
    )


def shard_assignment(
    docs: DataFrame,
    target_tokens: int,
    group_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-balanced shard ids for training-data EXPORT: within each
    ``group_col`` stream, docs in ``id_col`` order accumulate into a
    shard until its running token total would pass ``target_tokens``
    (a document never splits — shards overshoot by at most one doc,
    the standard WebDataset/jsonl.gz sharding rule).

    shard = floor(cum_before / target): deterministic, one running-sum
    window per group — parallelism is #groups, never a global sort.
    Writers then ``partitionBy(group, shard)`` so each output file
    lands near the target size. Returns (id, group, n_tokens, shard,
    shard_tokens_before)."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = whitespace_token_count(F.col(text_col))
    staged = docs.select(F.col(id_col), F.col(group_col), toks.alias("n_tokens"))
    cum_before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    shard = F.floor(cum_before / target_tokens)
    return staged.select(
        F.col(id_col),
        F.col(group_col),
        F.col("n_tokens"),
        shard.cast("long").alias("shard"),
        (cum_before % target_tokens).cast("long").alias("shard_tokens_before"),
    )


def temperature_weights(
    docs: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """(stratum, n_tokens, share, weight): temperature-scaled mixture
    weights from the corpus's own token distribution — weight_s ∝
    share_s^alpha, the standard multilingual/multi-domain rebalancing
    (alpha=1 keeps natural proportions, alpha→0 approaches uniform;
    cf. the sampling-temperature scheme of multilingual pretraining).

    One partial-agg groupBy(stratum) over token counts + a 1-row
    total broadcast — nothing scales with the corpus except the first
    aggregation. Feed the resulting weights into resample_mixture to
    materialize the rebalanced corpus."""
    from vanus_spark.llm.textstats import whitespace_token_count

    # materialize the #strata-row aggregate: `tot` derives from `per`,
    # and without this the corpus-scale token aggregation would appear
    # twice in the plan (Catalyst does not share repeated subtrees)
    per = docs.groupBy(strata_col).agg(
        F.sum(whitespace_token_count(F.col(text_col))).alias("n_tokens")
    ).localCheckpoint(eager=False)
    tot = per.agg(
        F.sum("n_tokens").alias("_t"),
        F.sum(
            F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))
        ).alias("_zn"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col(strata_col).alias("stratum"),
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("_t"), 9).alias("share"),
            F.round(
                F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))
                / F.col("_zn"),
                9,
            ).alias("weight"),
        )
    )


def weighted_sample(
    docs: DataFrame,
    weight_col: str,
    k: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-ES): each row draws the key u^(1/w) from a seeded-hash uniform
    u in (0,1]; the global top-k keys ARE a weighted sample — a row's
    inclusion probability is proportional to its weight, with no
    sequential state.

    The 100 TB shape: one hash + one pow per row, then a
    TakeOrderedAndProject top-k (per-partition heaps + one k-row
    merge) — never a global sort, no rejection loop, deterministic
    under (seed, id), so re-runs and incremental re-materializations
    agree. Rows with weight <= 0 are excluded (their key is
    undefined), matching the algorithm's domain."""
    u = (hash_uniform(F.col(id_col).cast("string"), seed) * 999_999 + 1) / 1_000_000.0
    key = F.pow(u, 1.0 / F.col(weight_col).cast("double"))
    top = (
        docs.where(F.col(weight_col) > 0)
        .withColumn("_aes_key", key)
        .orderBy(F.desc("_aes_key"), F.asc(id_col))
        .limit(k)  # TakeOrderedAndProject: per-partition heaps, k-row merge
    )
    # rank assignment runs over the k surviving rows only — the global
    # window here sorts k rows, not the corpus
    w = Window.orderBy(F.desc("_aes_key"), F.asc(id_col))
    return top.withColumn("sample_rank", F.row_number().over(w)).select(
        *docs.columns, "sample_rank"
    )


def flatten_conversations(
    convs: DataFrame,
    id_col: str = "conv_id",
    json_col: str = "conversation",
) -> DataFrame:
    """Parse a JSON chat-transcript column (the SFT-data interchange
    shape: ``[{"role": ..., "content": ...}, ...]``) into per-turn
    rows (id, turn_idx, role, content) — the flattening step every
    instruction-tuning pipeline runs before masking/packing.

    One from_json + posexplode over the scan: the JSON parses ONCE per
    row (the single-parse discipline of the filter dialects), and the
    explode's output partitioning is the scan's — zero shuffle."""
    schema = "array<struct<role string, content string>>"
    return (
        convs.withColumn("_turns", F.from_json(F.col(json_col), schema))
        .select(id_col, F.posexplode("_turns").alias("turn_idx", "_t"))
        .select(
            id_col,
            "turn_idx",
            F.col("_t.role").alias("role"),
            F.col("_t.content").alias("content"),
        )
    )


def conversation_stats(
    turns: DataFrame, id_col: str = "conv_id"
) -> DataFrame:
    """Per-conversation QA rollup over flattened turns: turn counts by
    role, first/last role, strict user/assistant alternation flag, and
    content volume — the validity gate SFT curation applies before
    training (non-alternating or assistant-first transcripts get
    dropped). One partial-agg groupBy; alternation is checked via a
    bounded per-conversation window (turns per conversation are
    bounded by construction)."""
    w = Window.partitionBy(id_col).orderBy("turn_idx")
    flagged = turns.withColumn(
        "_alt",
        F.coalesce(F.lag("role").over(w) != F.col("role"), F.lit(True)),
    )
    return flagged.groupBy(id_col).agg(
        F.count("*").alias("n_turns"),
        F.sum((F.col("role") == "user").cast("long")).alias("n_user"),
        F.sum((F.col("role") == "assistant").cast("long")).alias("n_assistant"),
        F.min_by("role", "turn_idx").alias("first_role"),
        F.max_by("role", "turn_idx").alias("last_role"),
        F.min(F.col("_alt").cast("int")).cast("boolean").alias("alternation_ok"),
        F.sum(F.length("content")).alias("content_chars"),
    )


def pack_turns_with_masks(
    turns: DataFrame,
    capacity: int,
    id_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "content",
    loss_roles: tuple[str, ...] = ("assistant",),
) -> DataFrame:
    """Loss-mask-aware packing of flattened SFT turns: conversations
    lay end-to-end (by id, then turn order) into fixed ``capacity``-
    token context windows, and every turn carries its pack-relative
    span plus ``loss_mask`` — 1 only for ``loss_roles`` turns (the
    prompt/user tokens train with loss masked out, the standard SFT
    objective).

    Same scale shape as pack_sequences — one running token sum per
    window; here the window is GLOBAL over (id, turn) via the
    two-phase distributed rank + a prefix-sum broadcast rather than a
    single-task window, so the packer holds at corpus scale.

    The prefix groups are distributed_row_number's OWN pinned
    ``_slice`` (rank-contiguous by construction — see the keep_slice
    contract in bus.py), NOT spark_partition_id() re-derived after
    the exchange: the rank output is hash-partitioned on _slice, so
    hash collisions / AQE coalescing can place non-adjacent rank
    ranges in one physical partition, which silently corrupted
    pack_id/pack_offset at >1 shuffle partition. Returns
    (id, turn, role, n_tokens, pack_id, pack_offset, loss_mask).
    """
    from vanus_spark.bus import distributed_row_number

    staged = turns.select(
        id_col,
        turn_col,
        role_col,
        whitespace_token_count(F.col(text_col)).alias("n_tokens"),
    )
    ranked = distributed_row_number(
        staged, [], [id_col, turn_col], "_rk", keep_slice=True
    )
    # global prefix sum without a global window: per-slice running
    # sums + a triangular broadcast join over the #slices-row totals
    # (same discipline as distributed_row_number's prefix counts; a
    # no-partition window here would both single-task and spam
    # WindowExec warnings)
    w_slice = (
        Window.partitionBy("_slice")
        .orderBy("_rk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local_cum = ranked.withColumn("_lcum", F.sum("n_tokens").over(w_slice))
    slice_tot = ranked.groupBy("_slice").agg(
        F.sum("n_tokens").alias("_stot")
    )
    earlier = slice_tot.select(
        F.col("_slice").alias("_e_slice"), F.col("_stot").alias("_e_stot")
    )
    prefixes = (
        slice_tot.join(
            F.broadcast(earlier), F.col("_e_slice") < F.col("_slice"), "left"
        )
        .groupBy("_slice")
        .agg(F.coalesce(F.sum("_e_stot"), F.lit(0)).alias("_pref"))
    )
    cum = F.col("_lcum") + F.col("_pref")
    cum_before = cum - F.col("n_tokens")
    pack_id = F.floor(cum_before / capacity)
    return (
        local_cum.join(F.broadcast(prefixes), "_slice")
        .select(
            id_col,
            turn_col,
            role_col,
            "n_tokens",
            pack_id.cast("long").alias("pack_id"),
            (cum_before % capacity).cast("long").alias("pack_offset"),
            F.col(role_col).isin(*loss_roles).cast("int").alias("loss_mask"),
        )
    )
