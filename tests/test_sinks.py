"""Write-path tests: the layout produced at write time must make the
promised read-time optimizations actually appear in plans."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigdatacw1_spark.plans import formatted_plan
from bigdatacw1_spark.sources.catalog import load_table
from bigdatacw1_spark.sources.sinks import write_bucketed, write_date_partitioned
from tests.conftest import SF_SMALL


def test_date_partitioned_write_prunes_partitions(spark, tmp_path):
    ev = load_table(spark, SF_SMALL, "events")
    out = str(tmp_path / "events_by_day")
    write_date_partitioned(ev, out, ts_col="ts")

    back = spark.read.parquet(out)
    one_day = back.select(F.col("__day")).distinct().orderBy("__day").head()[0]
    q = back.where(F.col("__day") == F.lit(one_day))
    plan = formatted_plan(q)
    # the day predicate must land in PartitionFilters (directory pruning),
    # not in PushedFilters / post-scan Filter
    assert "PartitionFilters" in plan and "__day" in plan.split("PartitionFilters", 1)[1][:200]
    # row parity with the unpartitioned source for that day
    expected = ev.where(F.to_date("ts") == F.lit(one_day)).count()
    assert q.count() == expected > 0


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # saveAsTable writes to the session warehouse dir (static conf);
    # DROP TABLE in the finally removes the managed files.
    o = load_table(spark, SF_SMALL, "orders")
    write_bucketed(o, "orders_b", ["o_custkey"], num_buckets=8)
    c = load_table(spark, SF_SMALL, "customer")
    write_bucketed(c, "customer_b", ["c_custkey"], num_buckets=8)

    ob, cb = spark.table("orders_b"), spark.table("customer_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ob.join(cb, ob["o_custkey"] == cb["c_custkey"])
        plan = formatted_plan(joined)
        # co-bucketed join: sort-merge without an Exchange on either side
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_upsert_overwrites_only_touched_partitions(spark, tmp_path):
    """Dynamic partition overwrite: rewriting one day must not truncate
    the others, and rewriting it twice must be idempotent."""
    from bigdatacw1_spark.sources.sinks import upsert_partitions, write_date_partitioned

    from bigdatacw1_spark.sources.catalog import load_table
    from tests.conftest import SF_SMALL

    out = str(tmp_path / "events_by_day")
    ev = load_table(spark, SF_SMALL, "events").withColumn("__day", F.to_date("ts"))
    write_date_partitioned(ev.drop("__day"), out, "ts")
    days = sorted(r["__day"] for r in ev.select("__day").distinct().collect())
    assert len(days) >= 2
    target = days[0]
    before_other = spark.read.parquet(out).where(F.col("__day") != F.lit(target)).count()

    # "Repair" the first day: halve its rows, double its value.
    repaired = (
        ev.where(F.col("__day") == F.lit(target))
        .where(F.col("event_id") % 2 == 0)
        .withColumn("value", F.col("value") * 2)
    )
    upsert_partitions(repaired, out, ["__day"])

    after = spark.read.parquet(out)
    assert after.where(F.col("__day") != F.lit(target)).count() == before_other
    assert after.where(F.col("__day") == F.lit(target)).count() == repaired.count()
    # Re-running the same upsert changes nothing (idempotent repair).
    upsert_partitions(repaired, out, ["__day"])
    assert spark.read.parquet(out).count() == before_other + repaired.count()
    # conf restored
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") in ("static", "STATIC")


def test_compact_parquet_reduces_file_count_and_preserves_rows(spark, tmp_path):
    from bigdatacw1_spark.sources.sinks import compact_parquet

    d = str(tmp_path / "frag")
    ev = load_table(spark, SF_SMALL, "events")
    ev.repartition(40).write.mode("overwrite").parquet(d)  # 40 tiny files
    import os

    before = sum(1 for f in os.listdir(d) if f.endswith(".parquet"))
    assert before >= 30
    n_rows = ev.count()
    new_files = compact_parquet(spark, d, target_file_mb=128)
    assert new_files < before and new_files >= 1
    after = spark.read.parquet(d)
    assert after.count() == n_rows
    assert sorted(after.columns) == sorted(ev.columns)


def test_read_binary_dir_lists_and_filters(spark, tmp_path):
    from bigdatacw1_spark.sources.formats import read_binary_dir

    d = tmp_path / "assets"
    d.mkdir()
    (d / "a.png").write_bytes(b"\x89PNG" + b"x" * 100)
    (d / "b.png").write_bytes(b"\x89PNG" + b"y" * 5000)
    (d / "c.txt").write_bytes(b"not an image")
    all_pngs = read_binary_dir(spark, str(d), glob="*.png")
    rows = {r.path.rsplit("/", 1)[-1]: r for r in all_pngs.collect()}
    assert set(rows) == {"a.png", "b.png"}
    assert rows["a.png"].length == 104 and rows["a.png"].content[:4] == b"\x89PNG"
    small = read_binary_dir(spark, str(d), glob="*.png", max_bytes=1000)
    assert [r.path.rsplit("/", 1)[-1] for r in small.collect()] == ["a.png"]


def test_zorder_write_prunes_on_both_columns(spark, tmp_path):
    import pyarrow.parquet as pq
    import glob as _glob

    from bigdatacw1_spark.sources.catalog import load_table
    from bigdatacw1_spark.sources.sinks import write_zordered
    from tests.conftest import SF_SMALL

    ev = load_table(spark, SF_SMALL, "events").select("user_id", "value", "event_id")
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "lex")
    write_zordered(ev, zpath, ["user_id", "value"], n_files=8)
    # Baseline: lexicographic sort clusters user_id only.
    (ev.repartitionByRange(8, "user_id").sortWithinPartitions("user_id")
       .write.mode("overwrite").parquet(lpath))

    def span_fraction(path, col):
        """Mean fraction of the global value range covered per file —
        lower = tighter min/max stats = more pruning."""
        spans, lo, hi = [], None, None
        for f in _glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            s = md.row_group(0).column(names[col]).statistics
            fmin, fmax = s.min, s.max
            for rg in range(1, md.num_row_groups):
                s = md.row_group(rg).column(names[col]).statistics
                fmin, fmax = min(fmin, s.min), max(fmax, s.max)
            spans.append((fmin, fmax))
            lo = fmin if lo is None else min(lo, fmin)
            hi = fmax if hi is None else max(hi, fmax)
        width = float(hi - lo) or 1.0
        return sum(float(b - a) for a, b in spans) / (len(spans) * width)

    # Z-order: BOTH dimensions tighten vs the global range; lexicographic
    # tightens user_id but leaves value unclustered (~full span per file).
    assert span_fraction(zpath, "user_id") < 0.6
    assert span_fraction(zpath, "value") < 0.6
    # ...and beats the lexicographic layout on the non-lead dimension.
    assert span_fraction(zpath, "value") < 0.8 * span_fraction(lpath, "value")
    # Same rows either way.
    assert spark.read.parquet(zpath).count() == ev.count()


def test_zorder_code_is_deterministic_and_jvm_side(spark):
    from bigdatacw1_spark.sources.catalog import load_table
    from bigdatacw1_spark.sources.sinks import zorder_code
    from tests.conftest import SF_SMALL
    from tests.test_plans import has_python_eval

    ev = load_table(spark, SF_SMALL, "events").select("user_id", "value")
    coded, col = zorder_code(ev, ["user_id", "value"], bits=8)
    assert not has_python_eval(coded)
    a = coded.agg(F.sum(col)).collect()[0][0]
    b = coded.agg(F.sum(col)).collect()[0][0]
    assert a == b and a is not None


def test_schema_evolution_merge_read(spark, tmp_path):
    """Parquet schema evolution on the read path: files written before a
    column existed coexist with files written after; mergeSchema=true
    unions the schemas and back-fills NULL — the add-a-column migration
    without rewriting history."""
    p = str(tmp_path / "evolving")
    spark.range(5).select(F.col("id"), F.lit("a").alias("v1")).write.parquet(p)
    (spark.range(5, 10)
        .select(F.col("id"), F.lit("b").alias("v1"), F.lit(1.5).alias("v2"))
        .write.mode("append").parquet(p))
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "v1", "v2"}
    assert merged.count() == 10
    assert merged.where(F.col("v2").isNull()).count() == 5
