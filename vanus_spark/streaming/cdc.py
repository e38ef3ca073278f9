"""CDC apply: fold Debezium-style change events into a ManifestTable.

The reference ships a Debezium -> MongoDB sink adapter
(actions/interp DEBEZIUM_CONVERT_TO_MONGODB_SINK mirrors
/root/reference's connector semantics); this is the Spark-native
destination side: a stream of (key, op, seq, payload...) change rows
applied to the ACID-ish manifest table so the table converges to the
source system's state.

Per batch (call from ``foreachBatch`` or a deterministic replay):

1. last-writer-wins WITHIN the batch — one per-key window ordered by
   the change sequence (Debezium's source offset), so a key touched
   ten times in a batch costs one row;
2. the surviving upserts apply as ONE partition-pruned MERGE;
3. the surviving deletes apply as ONE key-set anti-join delete.

Cross-batch ordering comes from the stream itself (micro-batches are
ordered); within-batch ordering from ``seq_col``. Both table writes
are epoch-fenced commits, so a crash mid-batch leaves the table at a
consistent prior epoch and the replayed batch re-applies idempotently
(same keys, same final rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from vanus_spark.sources.manifest_table import ManifestTable


def apply_cdc_batch(
    table: ManifestTable,
    batch: DataFrame,
    op_col: str = "op",
    seq_col: str = "seq",
    delete_op: str = "d",
) -> dict:
    """Apply one micro-batch of change events. ``batch`` columns =
    table columns + op_col + seq_col. Returns apply stats."""
    key = table.key_col
    w = Window.partitionBy(key).orderBy(F.col(seq_col).desc())
    last = (
        batch.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    upserts = last.where(F.col(op_col) != delete_op).drop(op_col, seq_col)
    deletes = last.where(F.col(op_col) == delete_op).select(key)
    # ONE probe job for both sides' presence (two limit(1).count()
    # probes doubled this operator's fixed per-batch job count)
    counts = last.agg(
        F.sum((F.col(op_col) != delete_op).cast("int")).alias("u"),
        F.sum((F.col(op_col) == delete_op).cast("int")).alias("d"),
    ).collect()[0]
    stats = {"upsert_buckets": 0, "delete_buckets": 0}
    if (counts["u"] or 0) > 0:
        stats["upsert_buckets"] = table.merge(upserts)["rewritten_buckets"]
    if (counts["d"] or 0) > 0:
        stats["delete_buckets"] = table.delete_keys(deletes)[
            "rewritten_buckets"
        ]
    stats["epoch"] = table._epoch
    return stats


def run_cdc_stream(
    spark,
    table: ManifestTable,
    source_dir: str,
    schema,
    op_col: str = "op",
    seq_col: str = "seq",
    checkpoint_dir: str | None = None,
    available_now: bool = False,
    trigger_seconds: float = 2.0,
):
    """Continuously fold a CDC file stream into the table: a real
    Structured Streaming query whose foreachBatch applies
    ``apply_cdc_batch``. If the source delivers several files in one
    micro-batch, the within-batch LWW fold (ordered by ``seq_col``)
    keeps convergence independent of file batching — the property the
    deterministic-replay oracle (cdc_apply_replay) pins.

    Returns the StreamingQuery; callers own awaitTermination/stop.
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = stream.writeStream.foreachBatch(
        lambda df, _eid: apply_cdc_batch(table, df, op_col, seq_col)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def run_aggregate_stream(
    spark,
    table: ManifestTable,
    source_dir: str,
    schema,
    agg_fn,
    sum_cols: list[str],
    checkpoint_dir: str | None = None,
    available_now: bool = False,
    trigger_seconds: float = 2.0,
):
    """Maintain a MATERIALIZED AGGREGATE table from a stream: each
    micro-batch runs ``agg_fn(batch_df) -> (key + sum_cols)`` partial
    aggregates and folds them into the table with an ADDITIVE merge
    (``merge_aggregate``), so the table always holds the running
    totals — the streaming-upsert sink pattern (a metrics rollup that
    downstream jobs can read transactionally at any epoch).

    Exactly-once under replay: the batch id is committed ATOMICALLY
    with the data (manifest ``#meta:applied_epoch``); foreachBatch is
    at-least-once, so a crash-replayed batch sees its own id already
    in the manifest and skips — no double counting, with no side
    marker files that could decouple from the commit.
    """

    def on_batch(df, epoch_id: int) -> None:
        table.refresh()
        last = int(table._meta.get("applied_epoch", -1))
        if epoch_id <= last:
            return  # replayed batch: already folded in atomically
        table.merge_aggregate(
            agg_fn(df), sum_cols, meta={"applied_epoch": str(epoch_id)}
        )

    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = stream.writeStream.foreachBatch(on_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
