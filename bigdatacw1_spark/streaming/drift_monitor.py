"""Streaming distribution-drift monitor: PSI per micro-batch.

The batch drift toolkit (operators/warehouse.ks_drift / psi_drift)
answers "did yesterday's load shift"; this module keeps the same PSI
statistic CONTINUOUSLY up to date against a frozen reference
distribution — the monitor a feature-ingestion stream runs so a schema-
valid but statistically broken upstream (stuck sensor, unit change,
silent filter) alarms within one micro-batch instead of at the next
nightly audit.

Design (all pieces reused from the verified batch operators):

  * the REFERENCE histogram is computed once, batch-side, with the same
    ``value_bucket`` expression the stream uses — bucketing drift between
    the two sides is impossible by construction;
  * the stream maintains running (group, bucket) counts with an
    update-mode aggregation — state is bounded by groups × n_buckets,
    never by stream length;
  * each micro-batch upserts only the CHANGED groups' counts into a tiny
    parquet histogram table (sinks.upsert_partitions — the same
    group-keyed exactly-once pattern as the continuous aggregate), then
    recomputes PSI from histograms alone (psi_from_histograms): cost per
    batch is histogram-sized, never corpus-sized.

Replaying a micro-batch after a crash rewrites the same group partitions
with the same totals (the aggregation state is checkpointed), so the
monitor output is replay-idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatacw1_spark.operators.warehouse import psi_from_histograms, value_bucket
from bigdatacw1_spark.streaming.windows import read_events_stream


def reference_histogram(
    ref: DataFrame,
    value_col: str = "value",
    group_cols: tuple[str, ...] = ("event_type",),
    bucket_width: float = 50.0,
    n_buckets: int = 10,
) -> DataFrame:
    """Frozen per-(group, bucket) counts of the accepted distribution."""
    return (
        ref.select(*group_cols, value_bucket(value_col, bucket_width, n_buckets).alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cb"))
    )


def run_psi_monitor(
    spark: SparkSession,
    events_dir: str,
    ref_hist: DataFrame,
    out_dir: str,
    value_col: str = "value",
    group_cols: tuple[str, ...] = ("event_type",),
    bucket_width: float = 50.0,
    n_buckets: int = 10,
):
    """Start the monitor (availableNow trigger for bounded replay in
    tests; drop the trigger for a live stream). Writes two tiny tables
    under ``out_dir``: hist/ (running observed histogram, upserted at
    group granularity) and psi/ (current PSI per group, overwritten each
    batch)."""
    from bigdatacw1_spark.sources.sinks import upsert_partitions

    ref_local = ref_hist.select(
        *group_cols, "bucket", F.col("cb")
    ).localCheckpoint(eager=True)

    stream = read_events_stream(spark, events_dir)
    counts = (
        stream.select(
            *group_cols, value_bucket(value_col, bucket_width, n_buckets).alias("bucket")
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("ca"))
    )
    hist_dir = os.path.join(out_dir, "hist")
    psi_dir = os.path.join(out_dir, "psi")

    def on_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_partitions(batch_df, hist_dir, [*group_cols, "bucket"])
        observed = spark.read.parquet(hist_dir).select(*group_cols, "bucket", "ca")
        # list-of-names full join coalesces the key columns itself
        merged = observed.join(ref_local, [*group_cols, "bucket"], "full").select(
            *group_cols,
            "bucket",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
        psi = psi_from_histograms(merged, list(group_cols), n_buckets)
        psi.write.mode("overwrite").parquet(psi_dir)

    return (
        counts.writeStream.foreachBatch(on_batch)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(out_dir, "chk"))
        .start()
    )
