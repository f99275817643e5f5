"""Streaming as-of enrichment: attach the latest quote at-or-before each
trade, incrementally, over a multiplexed market-data stream.

The batch engine converts currencies with an as-of join
(operators/finance.convert_currency); this module is the STREAMING path
for the same semantics — the shape a market-data feed actually has: one
topic carrying both quotes and trades (kind-tagged rows), where a trade
must be enriched with the most recent quote for its key seen so far,
including quotes from EARLIER micro-batches.

Spark's built-in stream-stream joins cannot express "latest right row
at-or-before" (they are windowed equi/interval joins), so the operator
runs as a foreachBatch fold with an explicit last-quote snapshot store —
the same persisted-state pattern as the LSH admission gate
(streaming/lsh_dedup.py):

  per micro-batch N:
    1. read the last-quote snapshot written by batch N-1 (one row per
       key — tiny: cardinality of currencies/symbols);
    2. union it with this batch's quotes and as-of join the batch's
       trades against it (operators/relational.as_of_join — one shuffle
       on the key, O(1) window state per row);
    3. write enriched trades to ``out_dir/batch_id=N``;
    4. write the UPDATED snapshot (argmax quote per key) to
       ``state_dir/batch_id=N``.

Replay idempotency: a re-delivered batch N rebuilds from snapshot N-1
and overwrites its own two partitions — at-least-once foreachBatch
becomes exactly-once output, the same argument as the windowed parquet
sink. Determinism requires the feed replayed in event-time order across
batches (the realistic ingestion shape; tests build it that way) —
within a batch the as-of join itself orders by (ts, tag).

At 100 TB: the snapshot is keys × 1 row (broadcastable forever); the
per-batch join cost is batch-sized, never corpus-sized; the snapshot
store lives on whatever filesystem the cluster resolves (statefs routes
store maintenance through the Hadoop FileSystem API, same as the band
store).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatacw1_spark.operators.relational import argmin_per_group, as_of_join
from bigdatacw1_spark.streaming.statefs import check_store_path, list_batch_ids


def _read_snapshot(
    spark: SparkSession, state_dir: str, before_batch: int
) -> DataFrame | None:
    """Latest snapshot written by a batch id strictly below ``before_batch``
    (so a REPLAYED batch never sees its own earlier output). Partition
    listing goes through statefs (Hadoop FileSystem API with a local fast
    path), so the store works on any cluster filesystem."""
    prior = [i for i in list_batch_ids(spark, state_dir) if i < before_batch]
    if not prior:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"batch_id={max(prior)}"))


def enrich_trades_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    snapshot: DataFrame | None,
    key_col: str = "key",
    ts_col: str = "ts",
    kind_col: str = "kind",
    val_col: str = "val",
) -> tuple[DataFrame, DataFrame]:
    """One fold step on a STATIC frame: returns (enriched_trades,
    new_snapshot). Pure function of (batch, snapshot) — the unit the
    stream driver folds and the tests check directly."""
    quotes = batch_df.where(F.col(kind_col) == "quote").select(
        key_col, ts_col, F.col(val_col).alias("rate")
    )
    if snapshot is not None:
        quotes = quotes.unionByName(snapshot)
    trades = batch_df.where(F.col(kind_col) == "trade").select(
        key_col, F.col(ts_col).alias("__trade_ts"), F.col(val_col).alias("amount")
    )
    enriched = as_of_join(
        trades,
        quotes.withColumnRenamed(ts_col, "__quote_ts"),
        [key_col],
        "__trade_ts",
        "__quote_ts",
        ["rate"],
    ).select(
        key_col,
        F.col("__trade_ts").alias(ts_col),
        "amount",
        "rate",
        (F.col("amount") * F.col("rate")).alias("converted"),
    )
    # rate as the final tiebreak makes simultaneous quotes deterministic
    new_snapshot = argmin_per_group(quotes, [key_col], [F.desc(ts_col), F.desc("rate")])
    return enriched, new_snapshot


def run_asof_enrich_stream(
    spark: SparkSession,
    feed_stream: DataFrame,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str | None = None,
    key_col: str = "key",
    ts_col: str = "ts",
    kind_col: str = "kind",
    val_col: str = "val",
):
    """Drive enrich_trades_batch over a streaming feed (availableNow).
    Enriched trades land in ``out_dir/batch_id=N``; last-quote snapshots
    in ``state_dir/batch_id=N`` — both overwrite-by-batch-id."""
    check_store_path(spark, state_dir, "state_dir")
    check_store_path(spark, out_dir, "out_dir")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        snapshot = _read_snapshot(spark, state_dir, batch_id)
        enriched, new_snapshot = enrich_trades_batch(
            spark, batch_df, snapshot, key_col, ts_col, kind_col, val_col
        )
        enriched.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )
        new_snapshot.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch_id={batch_id}")
        )

    return (
        feed_stream.writeStream.foreachBatch(write_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir or out_dir + "_chk")
        .start()
    )


def read_enriched(spark: SparkSession, out_dir: str) -> DataFrame:
    """All enriched trades across batches (batch_id dropped)."""
    return spark.read.option("basePath", out_dir).parquet(out_dir).drop("batch_id")
