"""Stream-stream interval join and streaming deduplication (SURVEY.md §2.9).

Same design rule as streaming/windows.py: each operator is ONE
transformation valid for both static and streaming frames, so the batch
entries in queries/streaming_suite.py oracle-check the semantics and
tests/test_streaming.py checks the incremental execution.

Scale notes:
- The interval join is an equi join on user_id with a bounded time
  residual; under streaming, watermarks on BOTH sides plus the explicit
  time bound let Spark expire join state (without the bound, state grows
  forever). In batch it's a plain shuffle join on the same key.
- dropDuplicatesWithinWatermark keeps one state entry per key only until
  the watermark passes it — the streaming form of ingest dedup (exactly
  the at-least-once→exactly-once repair a 100 TB ingest needs). The
  batch degenerate form is dropDuplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatacw1_spark.streaming.windows import read_events_stream


def view_click_pairs(
    views: DataFrame, clicks: DataFrame, horizon_min: int = 5, how: str = "inner"
) -> DataFrame:
    """Attribution-style interval join: for each view, the clicks by the
    same user in (view.ts, view.ts + horizon]. Strict lower bound keeps
    the pair count stable under self-overlap of event streams.

    ``how="left_outer"`` additionally emits unmatched views with NULL
    click columns — under streaming, Spark holds a view in state until
    the CLICK-side watermark passes view.ts + horizon (only then can
    "no click arrived" be decided), which is why outer stream-stream
    joins demand watermarks on both inputs; views newer than the final
    watermark never get their NULL row emitted (they are still
    undecided), so a streaming outer result is a prefix of the batch
    one. In batch it is a plain left join."""
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    cond = (
        (v["v_user"] == c["c_user"])
        & (c["c_ts"] > v["v_ts"])
        & (c["c_ts"] <= v["v_ts"] + F.expr(f"INTERVAL {horizon_min} MINUTES"))
    )
    return v.join(c, cond, how)


def dedup_events(
    events: DataFrame, id_cols: tuple[str, ...] = ("event_id",), delay: str = "30 minutes"
) -> DataFrame:
    """Keep the first occurrence per id. Streaming: state-bounded via
    dropDuplicatesWithinWatermark (duplicates arriving within ``delay``
    of each other are caught; state for older keys is evicted). Batch:
    plain dropDuplicates — the degenerate single-batch form."""
    if events.isStreaming:
        return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(list(id_cols))
    return events.dropDuplicates(list(id_cols))


def run_join_stream_to_memory(
    spark: SparkSession,
    events_dir: str,
    table_name: str = "join_out",
    horizon_min: int = 5,
    watermark: str = "30 minutes",
    how: str = "inner",
):
    """Stream-stream inner join of the view and click slices of one event
    stream, append-mode to a memory sink. Two independent readStream
    sources (as production would read two topics); both watermarked so
    join state expires."""
    views = read_events_stream(spark, events_dir).where(F.col("event_type") == "view")
    clicks = read_events_stream(spark, events_dir).where(F.col("event_type") == "click")
    joined = view_click_pairs(
        views.withWatermark("ts", watermark),
        clicks.withWatermark("ts", watermark),
        horizon_min,
        how,
    )
    return (
        joined.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def run_dedup_stream_to_memory(
    spark: SparkSession,
    events_dir: str,
    table_name: str = "dedup_out",
    delay: str = "30 minutes",
):
    """Watermarked streaming dedup on event_id, append-mode memory sink."""
    stream = read_events_stream(spark, events_dir)
    deduped = dedup_events(stream, ("event_id",), delay)
    return (
        deduped.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def enrich_with_dimension(events: DataFrame, dim: DataFrame, on) -> DataFrame:
    """Stream-static enrichment join: attach slowly-changing dimension
    attributes to a fact stream. The static side is broadcast, so under
    streaming each micro-batch joins against the executor-local copy —
    no streaming state at all (unlike stream-stream joins), and the
    stream side never shuffles. The canonical 100 TB pattern for
    decorating an event firehose with account/catalog metadata. Works
    identically on a batch frame (degenerate single-batch form)."""
    return events.join(F.broadcast(dim), on, "left")
