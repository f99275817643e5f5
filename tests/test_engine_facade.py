"""Both front ends (SQL string, DataFrame chain) must produce identical
results from the same catalog — they are the same logical plan to
Catalyst (SURVEY.md §3.3)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigdatacw1_spark.engine import Engine
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark=spark, sf_dir=SF_SMALL)


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sql_and_dataframe_fronts_converge(eng):
    sql_res = eng.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n
        FROM orders
        WHERE o_totalprice > 1000
        GROUP BY o_orderpriority
        """
    )
    df_res = (
        eng.table("orders")
        .where(F.col("o_totalprice") > 1000)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert _sorted_rows(sql_res) == _sorted_rows(df_res)
    assert sql_res.schema == df_res.schema


def test_unknown_table_rejected(eng):
    with pytest.raises(KeyError):
        eng.table("nope")


def test_all_tables_resolvable_from_both_fronts(eng):
    for name in eng.tables():
        assert eng.sql(f"SELECT * FROM {name} LIMIT 1").count() in (0, 1)
        assert eng.table(name).limit(1).count() in (0, 1)


def test_observe_collects_metrics_during_single_action(spark):
    from bigdatacw1_spark.engine import Engine

    eng = Engine(spark=spark, sf_dir=SF_SMALL)
    orders = eng.table("orders")
    df, obs = eng.observe(
        orders,
        {
            "rows": F.count(F.lit(1)),
            "null_keys": F.count_if(F.col("o_custkey").isNull()),
            "max_price": F.max("o_totalprice"),
        },
    )
    n = df.count()  # the ONE action; metrics ride along
    got = obs.get
    assert got["rows"] == n
    assert got["null_keys"] == 0
    assert got["max_price"] > 0


def test_run_query_uses_engine_sf_dir(spark):
    from bigdatacw1_spark.engine import Engine

    eng = Engine(spark=spark, sf_dir=SF_SMALL)
    assert eng.run_query("a10_min_max").count() > 0


def test_materialize_registers_stored_result_not_plan(spark, tmp_path):
    from bigdatacw1_spark.engine import Engine

    eng = Engine(spark=spark, sf_dir=SF_SMALL)
    path = str(tmp_path / "mv_seg")
    mv = eng.materialize(
        "mv_segment_totals",
        "SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY c_mktsegment",
        path,
    )
    # Queryable through both front ends, and served from the parquet
    # materialization (scan of the stored path, no aggregate replay).
    n1 = eng.sql("SELECT SUM(n) FROM mv_segment_totals").collect()[0][0]
    assert n1 == eng.table("customer").count()
    plan = eng.sql("SELECT * FROM mv_segment_totals")._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" in plan and "HashAggregate" not in plan
    # Refresh picks up new results under the same name.
    eng.materialize("mv_segment_totals", "SELECT 'x' AS c_mktsegment, 1 AS n", path)
    assert eng.sql("SELECT COUNT(*) FROM mv_segment_totals").collect()[0][0] == 1


def test_engine_pipeline_front_end_with_implicit_lookup(spark):
    """Engine.pipeline runs the Mongo dialect against catalog tables,
    with every catalog table implicitly joinable via $lookup."""
    from bigdatacw1_spark.engine import Engine
    from tests.conftest import SF_SMALL

    eng = Engine(spark, sf_dir=SF_SMALL)
    out = eng.pipeline("orders", [
        {"$match": {"o_totalprice": {"$gt": 100000}}},
        {"$lookup": {"from": "customer", "localField": "o_custkey",
                      "foreignField": "c_custkey", "as": "cust"}},
        {"$unwind": "$cust"},
        {"$group": {"_id": "$cust.c_mktsegment", "n": {"$sum": 1}}},
    ])
    rows = out.collect()
    assert len(rows) > 1 and all(r["n"] > 0 for r in rows)
    sql = eng.sql("""
        SELECT c_mktsegment, COUNT(*) AS n FROM orders
        JOIN customer ON o_custkey = c_custkey
        WHERE o_totalprice > 100000 GROUP BY c_mktsegment
    """)
    assert {(r["_id"], r["n"]) for r in rows} == {(r["c_mktsegment"], r["n"]) for r in sql.collect()}


def test_engine_sql_script_front_end(spark):
    """Multi-statement script through the facade: search_path consumed,
    one DataFrame per query, catalog views visible."""
    from bigdatacw1_spark.engine import Engine

    eng = Engine(spark=spark, sf_dir="/root/testdata/sf0.001")
    out = eng.sql_script(
        """
        set search_path = cash_equity, "$user", public;
        -- count orders; semicolon in a literal: ';'
        select count(*) as n from orders;
        select o_orderpriority, count(*) as n from orders group by 1 order by 1;
        """
    )
    assert len(out) == 2
    assert out[0].first()["n"] > 0
    assert len(out[1].collect()) >= 2


def test_explain_reports_scale_flags(spark):
    from bigdatacw1_spark.engine import Engine
    from tests.conftest import SF_SMALL

    eng = Engine(spark=spark, sf_dir=SF_SMALL)
    out = eng.explain("tpch_q5_local_volume")
    head = out.splitlines()[0]
    assert head.startswith("flags: [") and "BHJ" in head
    assert "== Physical Plan ==" in out
    # DataFrame form + GW flag surfaces a partition-less window
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    g = eng.table("orders").withColumn(
        "r", F.row_number().over(Window.orderBy("o_orderkey"))
    )
    assert "GW×1" in eng.explain(g).splitlines()[0]
