"""Streaming corpus ingest: the arriving-documents half of the
training-data pipeline (SURVEY.md §2.11 operators, applied to a stream).

Batch curation (operators/dedup.py, functions/text.py) assumes the corpus
is at rest; real corpora ARRIVE. This wires the same content fingerprint
and quality gates into a Structured Streaming pass, so a document is
admitted exactly once (content-hash dedup within a watermark) and junk is
quarantined at the door rather than cleaned up later:

  - dedup key = normalized_fingerprint(text): case/whitespace-folded md5
    — the SAME function the batch path groups by, so stream-admitted and
    batch-deduped corpora agree;
  - dropDuplicatesWithinWatermark bounds state: a duplicate arriving
    within ``delay`` of the original is dropped, older fingerprint state
    is evicted (at 100 TB/day the state is a bounded fingerprint set,
    never the corpus);
  - the quality gate is a stateless row filter (token_quality_score) —
    no state, no shuffle, evaluated before the dedup state ever sees
    low-quality rows.

Transforms are defined once over either a static or streaming frame
(``df.isStreaming`` dispatch, same discipline as streaming/joins.py), so
the batch degenerate form is oracle-testable and the streaming form is
equivalence-tested in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatacw1_spark.functions.text import (
    normalized_fingerprint,
    token_quality_score,
    tokens,
)
from bigdatacw1_spark.sources.catalog import TABLES


def read_documents_stream(
    spark: SparkSession, docs_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source streaming read of a documents directory, with an
    ingest timestamp (file streams have no event time of their own)."""
    return (
        spark.readStream.schema(TABLES["documents"])
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
        .withColumn("ingest_ts", F.current_timestamp())
    )


def admit_documents(
    docs: DataFrame,
    min_quality: float = 0.0,
    delay: str = "10 minutes",
    ts_col: str = "ingest_ts",
    dedup_on: str = "fingerprint",
) -> DataFrame:
    """Quality-gate then content-dedup a document feed. Works on static
    frames (plain dropDuplicates — the batch degenerate form) and
    streaming frames (watermarked, state-bounded). Appends the
    ``fingerprint`` and ``quality`` columns it decided on, for audit.

    ``dedup_on`` picks the admission key:
      - 'fingerprint' (default): exact after case/whitespace folding;
      - 'simhash': the 64-bit SimHash signature computed PER ROW
        (token-hash sign aggregation via higher-order functions — no
        explode, no shuffle, streaming-safe), so token-preserving edits
        (reflowed whitespace, casing, reordered lines with identical
        token multisets... anything that keeps the per-token hash sums)
        collapse to one admitted copy. A streaming NEAR-dup gate at
        exact-match cost; true fuzzy near-dup (edit-distance level)
        still needs the batch LSH pipeline over the admitted corpus.
    """
    toks = tokens(F.col("text"))
    scored = docs.withColumn("quality", token_quality_score(toks, F.col("text")))
    kept = scored.where(F.col("quality") >= min_quality)
    fp = kept.withColumn("fingerprint", normalized_fingerprint("text"))
    if dedup_on == "simhash":
        fp = fp.withColumn("simhash", rowwise_simhash(tokens(F.col("text"))))
        key = "simhash"
    elif dedup_on == "fingerprint":
        key = "fingerprint"
    else:
        raise ValueError(f"dedup_on must be fingerprint|simhash, not {dedup_on!r}")
    if fp.isStreaming:
        return fp.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark([key])
    return fp.dropDuplicates([key])


def rowwise_simhash(toks) -> "F.Column":
    """64-bit SimHash of a token array as a single row-local expression:
    one ``aggregate`` pass folds every token's xxhash64 (hashed ONCE per
    token) into 64 signed bit-counters via zip_with, then the signs pack
    into one long. No explode, no aggregation state — usable inside a
    streaming stateless projection, unlike operators/dedup.simhash64
    (which explodes + groups for the batch path)."""

    def bitvec(h):
        return F.array(
            *[
                F.when(
                    F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1).cast("long"),
                ).otherwise(F.lit(-1).cast("long"))
                for i in range(64)
            ]
        )

    counts = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, t: F.zip_with(acc, bitvec(F.xxhash64(t)), lambda a, b: a + b),
    )
    sig = F.lit(0).cast("long")
    for i in range(64):  # pack: 64 element_ats over the 64-long counters
        sig = sig.bitwiseOR(
            F.when(
                F.element_at(counts, i + 1) >= 0,
                F.shiftleft(F.lit(1).cast("long"), i),
            ).otherwise(F.lit(0).cast("long"))
        )
    return sig


def run_ingest_to_parquet(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    min_quality: float = 0.0,
    delay: str = "10 minutes",
):
    """Admitted documents appended to a parquet corpus (availableNow).
    Append mode + within-watermark dedup means a fingerprint is written
    at most once per watermark window — the at-most-once admission the
    batch dedup otherwise has to re-establish corpus-wide."""
    stream = read_documents_stream(spark, docs_dir)
    admitted = admit_documents(stream, min_quality=min_quality, delay=delay)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    return (
        admitted.writeStream.foreachBatch(write_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", out_dir + "_chk")
        .start()
    )
