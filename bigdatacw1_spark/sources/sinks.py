"""Write paths: partitioned and bucketed parquet sinks.

The reference has no write path at all (results were read off interactive
clients — SURVEY.md §2.1 S4); an engine meant for 100 TB needs the
layout-producing side too, because the WRITE layout is what makes later
reads cheap:

  - partitioning by a low-cardinality column (typically the date) turns
    time-range predicates into directory pruning — Catalyst's
    PartitionFilters skip whole partitions before any I/O;
  - bucketing by a join/group key pre-shuffles the data once at write
    time, so every later join or aggregation on that key is shuffle-free
    (Spark reads bucket files aligned by hash).

Both write plain parquet any reader (including the DuckDB oracle) can
consume.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet. Partition columns should be
    low-cardinality (a date or date-derived bucket, a region, a source);
    high-cardinality partitioning creates a small-file storm."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    mode: str = "overwrite",
) -> None:
    """Partition a fact table by the DAY of its event-time column — the
    standard layout for time-series facts (equity_prices-style tables,
    events): time-range queries prune to the matching day directories."""
    out = df.withColumn("__day", F.to_date(F.col(ts_col)))
    out.write.mode(mode).partitionBy("__day").parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) managed table: pre-shuffles on the
    bucket key at write time so subsequent joins/aggregations on that key
    need no exchange. Requires saveAsTable (bucket metadata lives in the
    catalog)."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table_name)


def upsert_partitions(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
) -> None:
    """Idempotent incremental load: overwrite ONLY the partitions present
    in ``df``, leave every other partition untouched (dynamic partition
    overwrite). This is the backfill/late-data repair shape for a
    date-partitioned 100 TB fact table — re-running a day's pipeline
    replaces that day exactly, without a read-modify-write of the table
    and without `mode=overwrite`'s truncate-the-world behavior.

    Uses the session-settable `spark.sql.sources.partitionOverwriteMode`
    conf scoped to this write (restored after)."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set(key, prev)


def compact_parquet(
    spark,
    path: str,
    target_file_mb: int = 128,
    partition_cols: Sequence[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet dataset into files of
    ~``target_file_mb`` each and return the new file count. The
    maintenance job every long-lived ingest needs — streaming sinks and
    per-batch appends accrete thousands of KB-scale files whose
    per-file open/footer cost eventually dominates scans, and whose
    listing alone stalls planning at 100 TB.

    File count = ceil(bytes_on_disk / target); sizing from the OS-level
    byte size (not row counts) keeps the estimate schema-independent.
    The rewrite is a round-robin ``repartition(n)`` — one shuffle, even
    output sizes. With ``partition_cols`` the layout is preserved via
    dynamic partition overwrite and files even out per-partition by
    repartitioning on the partition key (skewed partitions still split
    under AQE). Writes to a temp sibling then swaps, so a crash
    mid-compact never leaves the dataset half-rewritten."""
    import math
    import os
    import shutil

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    n = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__compact_tmp__"
    if partition_cols:
        out = df.repartition(n, *[F.col(c) for c in partition_cols])
        out.write.mode("overwrite").partitionBy(*partition_cols).parquet(tmp)
    else:
        df.repartition(n).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    new_files = 0
    for root, _dirs, files in os.walk(path):
        new_files += sum(1 for f in files if f.endswith(".parquet"))
    return new_files


def zorder_code(
    df: DataFrame, cols: Sequence[str], bits: int = 12
) -> tuple[DataFrame, str]:
    """Append a Morton (Z-order) code column interleaving ``bits``
    equal-width bucket bits of each column in ``cols``. Returns
    (df_with_code, code_column_name).

    The per-column bucket is ``width_bucket`` over broadcast global
    min/max bounds (one tiny agg, same pattern as the histogram
    operator) — a narrow map at any scale. Bit interleaving is plain
    integer shifts, fully codegen'd; no Python touches the data.
    """
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"__lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__hi_{c}") for c in cols],
    )
    with_bounds = df.crossJoin(F.broadcast(bounds))
    n_buckets = 1 << bits
    code = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        # width_bucket returns 1..n+1; clamp into [0, n_buckets).
        b = F.least(
            F.greatest(
                F.width_bucket(
                    F.col(c).cast("double"),
                    F.col(f"__lo_{c}"),
                    F.col(f"__hi_{c}"),
                    F.lit(n_buckets),
                ) - 1,
                F.lit(0),
            ),
            F.lit(n_buckets - 1),
        ).cast("long")
        for bit in range(bits):
            code = code.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, bit).bitwiseAND(F.lit(1)),
                    bit * len(cols) + i,
                )
            )
    out = with_bounds.withColumn("__zorder", code).drop(
        *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols]
    )
    return out, "__zorder"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 8,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet: range-partition + sort by the Morton
    code of ``cols``, so every output file covers a small hyper-rectangle
    of the value space and parquet min/max stats prune on EVERY z-ordered
    column, not just a lead sort key.

    This is the multi-dimensional clustering move (Delta/Iceberg OPTIMIZE
    ZORDER BY) for plain parquet: a point/range predicate on any of the
    ``cols`` skips most files at planning time via row-group statistics.
    Lexicographic sorting prunes only the first column; Z-ordering trades
    a little locality on each column for pruning power on all of them.
    One range shuffle on the code (sampled bounds, skew-tolerant), one
    local sort — the same cost as any global sort-write.
    """
    coded, code_col = zorder_code(df, cols, bits)
    (
        coded.repartitionByRange(n_files, F.col(code_col))
        .sortWithinPartitions(code_col)
        .drop(code_col)
        .write.mode(mode)
        .parquet(path)
    )
