"""Structured Streaming layer over the events stream (SURVEY.md §2.9).

The reference is purely batch; this is the driver-contract extension.
Design rule: every streaming aggregation is defined ONCE as a
transformation applicable to both a static and a streaming DataFrame —
the batch entries in queries/streaming_suite.py and the readStream path
here share the same functions, and tests assert batch/stream equivalence
(the Structured Streaming correctness contract: a streaming query's
final result equals the batch query over the same data).

Scale: windowed aggregations shuffle on (window, key); watermarks bound
state (late events beyond the watermark are dropped); at 100 TB the
source would be Kafka/files with many partitions and the same code runs
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatacw1_spark.operators.relational import exact_sum
from bigdatacw1_spark.sources.catalog import TABLES


def tumbling_counts(events: DataFrame, minutes: int = 10) -> DataFrame:
    """Tumbling event-time windows: count + exact-decimal sum per
    (window, event_type). Works on both static and streaming frames."""
    return (
        events.groupBy(
            F.window("ts", f"{minutes} minutes").alias("w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), exact_sum("value", scale=2, digits=2).alias("sum_v"))
        .select(F.col("w.start").alias("wstart"), "event_type", "n", "sum_v")
    )


def sliding_counts(events: DataFrame, width_min: int = 10, slide_min: int = 5) -> DataFrame:
    """Sliding windows (width > slide ⇒ each event lands in
    width/slide windows)."""
    return (
        events.groupBy(F.window("ts", f"{width_min} minutes", f"{slide_min} minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), exact_sum("value", scale=2, digits=2).alias("sum_v"))
        .select(F.col("w.start").alias("wstart"), "n", "sum_v")
    )


def session_aggregate(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session windows per user (gap-based): built-in session_window —
    stateful merge in streaming, gaps-and-islands equivalent in batch."""
    return (
        events.groupBy(F.session_window("ts", f"{gap_minutes} minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), exact_sum("value", scale=2, digits=2).alias("sum_v"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_v",
        )
    )


def read_events_stream(spark: SparkSession, events_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source streaming read of an events directory (µs-timestamp
    parquet written by tests or production ingestion).

    The catalog's canonical event-time type is TIMESTAMP_NTZ (the files
    carry no zone), but Spark's event-time machinery — withWatermark,
    stream-stream join bounds — requires zoned TIMESTAMP
    ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]). The streaming boundary is
    therefore where ts picks up its instant semantics: the engine pins
    spark.sql.session.timeZone=UTC (session.py), so the cast is
    value-preserving and batch/stream results stay comparable."""
    return (
        spark.readStream.schema(TABLES["events"])
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def run_windowed_stream_to_parquet(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    minutes: int = 10,
    watermark: str = "30 minutes",
):
    """Watermarked tumbling windows streamed to a parquet sink via
    foreachBatch: each micro-batch of completed windows is written as
    ordinary parquet any engine can read — the production hand-off shape
    (stream → columnar lake table). Append mode means a window is written
    once, when the watermark closes it; state never grows unboundedly.

    Exactly-once on top of at-least-once foreachBatch: each batch lands
    in its own ``batch_id=N`` partition directory with overwrite mode,
    so a micro-batch REPLAYED after a crash (foreachBatch's documented
    delivery guarantee is at-least-once) overwrites its own previous
    output instead of appending duplicates. Readers scanning ``out_dir``
    see batch_id as an ordinary audit partition column."""
    stream = read_events_stream(spark, events_dir)
    agged = tumbling_counts(stream.withWatermark("ts", watermark), minutes)

    def write_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return (
        agged.writeStream.foreachBatch(write_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", out_dir + "_chk")
        .start()
    )


def run_windowed_stream_to_memory(
    spark: SparkSession,
    events_dir: str,
    table_name: str = "stream_out",
    minutes: int = 10,
    watermark: str = "30 minutes",
):
    """Watermarked tumbling-window aggregation, streamed to an in-memory
    sink with availableNow (process-everything-then-stop) semantics.
    Returns the StreamingQuery; caller awaits termination then reads
    ``spark.table(table_name)``."""
    stream = read_events_stream(spark, events_dir)
    agged = tumbling_counts(stream.withWatermark("ts", watermark), minutes)
    return (
        agged.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )


def run_session_stream_to_memory(
    spark: SparkSession,
    events_dir: str,
    table_name: str = "sess_out",
    gap_minutes: int = 30,
    watermark: str = "30 minutes",
):
    """STREAMING session windows: the same session_aggregate transform,
    incrementally. Session windows are the one window type whose extent
    is data-driven (end = last event + gap), so the streaming engine must
    MERGE windows in state as events arrive and can only emit a session
    once the watermark passes its end — append mode + watermark is
    therefore mandatory, and the emitted set is exactly the sessions the
    watermark has closed (pinned against batch in tests). State per key
    is bounded by the watermark: closed sessions leave state."""
    stream = read_events_stream(spark, events_dir)
    agged = session_aggregate(stream.withWatermark("ts", watermark), gap_minutes)
    return (
        agged.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def run_continuous_aggregate(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    minutes: int = 60,
    watermark: str = "30 minutes",
):
    """Continuous aggregate: a streaming windowed rollup materialized as
    a queryable parquet table that late data REPAIRS in place. Update
    mode re-emits a (window, event_type) group every time a late event
    changes it; foreachBatch then overwrites exactly that group's
    partition via dynamic partition overwrite — the parquet-only
    equivalent of MERGE INTO keyed by the group, so the table always
    holds each group's latest value (append mode would instead write
    once, on close, and could never repair).

    Partitioning at merge-key granularity is what makes the overwrite
    exact; it is also a small-file storm if the key cardinality is high
    — production systems coarsen the partitions (e.g. per day) and use a
    transactional MERGE within them, or run sinks.compact_parquet as a
    follow-up. The demo keys on (wstart, event_type): bounded here, and
    exact-by-construction."""
    from bigdatacw1_spark.sources.sinks import upsert_partitions

    stream = read_events_stream(spark, events_dir)
    agged = tumbling_counts(stream.withWatermark("ts", watermark), minutes)

    def upsert_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_partitions(batch_df, out_dir, ["wstart", "event_type"])

    return (
        agged.writeStream.foreachBatch(upsert_batch)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", out_dir + "_chk")
        .start()
    )


def tumbling_distinct_users(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Exact windowed COUNT DISTINCT in the streaming-legal two-phase
    form: Spark forbids count(distinct) inside a streaming aggregation,
    so phase 1 DEDUPLICATES (window, event_type, user_id) — keyed state
    of one row per distinct triple, watermark-expirable — and phase 2 is
    an ordinary windowed count of the survivors. Same transformation
    works on static frames (the batch-equivalence anchor). Two keyed
    exchanges over the same key family; at 100 TB the state is bounded
    by distinct users per live window, not by events."""
    b = events.select(
        F.window("ts", f"{minutes} minutes").alias("w"), "event_type", "user_id"
    )
    dedup = b.dropDuplicates(["w", "event_type", "user_id"])
    return dedup.groupBy(F.col("w.start").alias("wstart"), "event_type").agg(
        F.count(F.lit(1)).alias("distinct_users")
    )


def run_distinct_users_stream_to_memory(
    spark: SparkSession,
    events_dir: str,
    table_name: str = "ndv_out",
    minutes: int = 60,
    watermark: str | None = None,
):
    """tumbling_distinct_users as a real stream (dropDuplicates state +
    windowed count, complete mode to an in-memory sink).

    Watermark note: unlike windowed AGGREGATION (where complete mode
    retains all state and accepts late rows), a watermarked
    dropDuplicates drops late INPUT rows in every output mode — replay
    from unordered files would silently lose data. Default is therefore
    no watermark (exact replay, unbounded dedup state); pass one in a
    real deployment to bound state, accepting the late-drop trade."""
    stream = read_events_stream(spark, events_dir)
    if watermark is not None:
        stream = stream.withWatermark("ts", watermark)
    agged = tumbling_distinct_users(stream, minutes)
    return (
        agged.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
