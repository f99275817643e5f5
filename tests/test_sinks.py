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
