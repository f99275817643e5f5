"""Multi-format readers: CSV / JSON-lines / ORC with the catalog's
declared schemas (SURVEY.md §2.1 — the reference has no file connectors;
these extend the engine to the formats a real ingest tier receives).

Design rules for 100 TB ingest:
- Schemas are ALWAYS passed explicitly (catalog.TABLES) — schema
  inference reads the data twice and can silently widen types between
  drops; with a declared schema the read is single-pass and stable.
- Malformed rows are captured, not fatal: PERMISSIVE mode plus a
  ``_corrupt_record`` rescue column for CSV/JSON, so one bad row in a
  terabyte drop quarantines instead of failing the job.
- Timestamps round-trip at microsecond precision via an explicit
  timestampFormat AND timestampNTZFormat (CSV writes would otherwise
  truncate). Both are set because the catalog declares TIMESTAMP_NTZ for
  the zone-less event/order/shipment times (catalog.TABLES) — a reader
  that sets only timestampFormat silently quarantines every NTZ row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdatacw1_spark.sources.catalog import TABLES

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _schema_with_rescue(name: str) -> T.StructType:
    base = TABLES[name]
    return T.StructType(list(base.fields) + [T.StructField("_corrupt_record", T.StringType())])


def read_csv(spark: SparkSession, path: str, table: str) -> DataFrame:
    """CSV with declared schema, header, and quarantine column."""
    return (
        spark.read.schema(_schema_with_rescue(table))
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("timestampFormat", _TS_FMT)
        .option("timestampNTZFormat", _TS_FMT)
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, table: str) -> DataFrame:
    """JSON-lines with declared schema and quarantine column."""
    return (
        spark.read.schema(_schema_with_rescue(table))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("timestampFormat", _TS_FMT)
        .option("timestampNTZFormat", _TS_FMT)
        .json(path)
    )


def read_orc(spark: SparkSession, path: str, table: str) -> DataFrame:
    """ORC with declared schema (columnar; schema mismatch fails fast)."""
    return spark.read.schema(TABLES[table]).orc(path)


def read_xml(spark: SparkSession, path: str, table: str, row_tag: str = "row") -> DataFrame:
    """XML with declared schema (Spark 4 built-in xml source; one row per
    ``row_tag`` element). XML is the interchange format B2B feeds still
    arrive in; the same declared-schema discipline applies — element text
    is parsed to the catalog types, and like CSV/JSON the timestamp
    formats are pinned for µs round-trips. (Avro is NOT wired: its data
    source module is external to the Spark distribution here; parquet/
    ORC cover the columnar interchange need.)"""
    return (
        spark.read.schema(TABLES[table])
        .option("rowTag", row_tag)
        .option("timestampFormat", _TS_FMT)
        .option("timestampNTZFormat", _TS_FMT)
        .xml(path)
    )


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a rescued read into (clean, quarantined) frames. The clean
    side drops the rescue column so downstream schemas match parquet.

    The parsed frame is cached first: Spark refuses queries that touch
    ONLY ``_corrupt_record`` on a raw file scan (the parser would have
    nothing else to parse), and both halves re-read the input otherwise.
    The cache is deliberately left alive — both returned frames depend on
    it; callers that are done with BOTH halves should release it with
    ``good.sparkSession.catalog.clearCache()`` or by unpersisting the
    shared parent (``release_quarantine``).
    """
    df = df.cache()
    bad = df.where(df["_corrupt_record"].isNotNull())
    good = df.where(df["_corrupt_record"].isNull()).drop("_corrupt_record")
    good._quarantine_parent = df  # handle for release_quarantine
    bad._quarantine_parent = df
    return good, bad


def release_quarantine(half: DataFrame) -> None:
    """Unpersist the cached parent behind a frame returned by
    ``quarantine_split``. Call once both halves are consumed; a no-op on
    frames that did not come from quarantine_split."""
    parent = getattr(half, "_quarantine_parent", None)
    if parent is not None:
        parent.unpersist()


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw-asset ingestion via Spark's built-in ``binaryFile`` source:
    one row per file with (path, modificationTime, length, content) —
    the entry point for image/audio/video corpora before the
    decode/feature UDFs in operators/multimodal.py take over.

    Scale notes: the source parallelizes over FILES (each file is one
    row, never split), so millions of small assets fan out fine but a
    directory of few giant files does not — shard such inputs upstream.
    ``glob`` (e.g. ``*.png``) prunes at listing time via
    pathGlobFilter, and ``max_bytes`` guards executor memory by
    filtering on the LENGTH metadata column BEFORE content is
    materialized into rows downstream.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.where(F.col("length") <= max_bytes)
    return df
