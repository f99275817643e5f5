"""Unbounded-source demo: the rate source as a stand-in for Kafka
(SURVEY.md §2.9).

The file-source streams in tests are bounded replays; this wires the
SAME windowed transformations to a genuinely unbounded source — Spark's
built-in rate source, which generates (timestamp, value) rows
continuously, exactly the shape of a Kafka topic read
(`spark.readStream.format("kafka")` differs only in source options and
a value-deserialization select). Nothing downstream changes: the
tumbling/sliding/session aggregations, watermarking, and sinks from
streaming/windows.py run unmodified — the point of the
one-transformation-for-batch-and-stream design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatacw1_spark.streaming.windows import tumbling_counts

_EVENT_TYPES = ["view", "click", "purchase", "error"]


def _map_rate(src: DataFrame) -> DataFrame:
    """Map a rate-shaped (timestamp, value) stream onto the events schema —
    the deserialize-and-project step a Kafka consumer would do."""
    types = F.array(*[F.lit(t) for t in _EVENT_TYPES])
    return src.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        F.pmod(F.col("value"), F.lit(50)).alias("user_id"),
        F.element_at(types, (F.pmod(F.col("value"), F.lit(4)) + 1).cast("int")).alias("event_type"),
        (F.pmod(F.col("value"), F.lit(1000)) / 10.0).alias("value"),
    )


def synthetic_events_from_rate(spark: SparkSession, rows_per_second: int = 500) -> DataFrame:
    """Unbounded wall-clock variant: rows arrive continuously at
    ``rows_per_second`` with real timestamps."""
    src = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    return _map_rate(src)


def synthetic_events_from_rate_micro_batch(
    spark: SparkSession,
    rows_per_batch: int = 100,
    advance_millis: int = 60_000,
    num_partitions: int = 2,
) -> DataFrame:
    """DETERMINISTIC unbounded source (``rate-micro-batch``,
    SPARK-37062): every micro-batch emits exactly ``rows_per_batch``
    rows with value = a global row counter and the event time advancing
    ``advance_millis`` per batch from epoch 0 — so each micro-batch
    lands in its own event-time minute and tests can assert EXACT
    window contents instead of racing the wall clock. Same mapped
    schema as the wall-clock variant; still genuinely unbounded (the
    query never self-terminates under a processing-time trigger)."""
    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("numPartitions", num_partitions)
        .option("startTimestamp", 0)
        .option("advanceMillisPerBatch", advance_millis)
        .load()
    )
    return _map_rate(src)


def run_rate_windowed_stream(
    spark: SparkSession,
    table_name: str = "rate_out",
    rows_per_second: int = 500,
    minutes: int = 1,
    watermark: str = "10 seconds",
):
    """Continuous tumbling-window aggregation over the unbounded source,
    complete-mode memory sink, micro-batches every second. Runs until
    the caller stops it — there is no end-of-input."""
    events = synthetic_events_from_rate(spark, rows_per_second)
    agged = tumbling_counts(events.withWatermark("ts", watermark), minutes)
    return (
        agged.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(processingTime="1 second")
        .start()
    )
