"""Properties of deterministic hash sampling (operators/sampling.py).

These are the guarantees a training pipeline actually relies on:
rerun-stability, nestedness across fractions, partitioning-invariance,
and leak-free splits. Cross-engine exactness is covered by the oracle
parity of the ext_*sample* queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatacw1_spark.operators.sampling import (
    hash_sample,
    md5_bucket,
    stratified_hash_sample,
    train_test_split,
)
from bigdatacw1_spark.sources.catalog import load_table

from tests.conftest import SF_SMALL


def _docs(spark):
    return load_table(spark, SF_SMALL, "documents")


def test_samples_are_nested_across_fractions(spark):
    d = _docs(spark)
    small = {r.doc_id for r in hash_sample(d, "doc_id", 0.02).select("doc_id").collect()}
    big = {r.doc_id for r in hash_sample(d, "doc_id", 0.20).select("doc_id").collect()}
    assert small <= big
    assert len(big) > len(small) > 0


def test_sample_is_partitioning_invariant(spark):
    d = _docs(spark)
    base = {r.doc_id for r in hash_sample(d, "doc_id", 0.1).select("doc_id").collect()}
    shuffled = {
        r.doc_id
        for r in hash_sample(d.repartition(13, "lang"), "doc_id", 0.1).select("doc_id").collect()
    }
    assert base == shuffled


def test_salt_redraws_the_sample(spark):
    d = _docs(spark)
    a = {r.doc_id for r in hash_sample(d, "doc_id", 0.2, salt="a").select("doc_id").collect()}
    b = {r.doc_id for r in hash_sample(d, "doc_id", 0.2, salt="b").select("doc_id").collect()}
    assert a != b  # astronomically unlikely to collide on ~600 docs


def test_stratified_fractions_apply_per_stratum(spark):
    d = _docs(spark)
    kept = stratified_hash_sample(d, "doc_id", "lang", {"en": 1.0}, default_fraction=0.0)
    by_lang = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    total_en = d.where(F.col("lang") == "en").count()
    assert by_lang == {"en": total_en}  # all of en, none of anything else


def test_split_is_exhaustive_exclusive_and_key_stable(spark):
    d = _docs(spark)
    tagged = train_test_split(d, "doc_id", test_fraction=0.25)
    assert tagged.where(~F.col("split").isin("train", "test")).count() == 0
    assert tagged.count() == d.count()
    # Join-stability: a derived table keyed by doc_id splits identically,
    # so no key can leak across the boundary.
    derived = d.select("doc_id", F.length("text").alias("feat"))
    tagged2 = train_test_split(derived, "doc_id", test_fraction=0.25)
    joined = tagged.select("doc_id", "split").join(
        tagged2.select("doc_id", F.col("split").alias("split2")), "doc_id"
    )
    assert joined.where(F.col("split") != F.col("split2")).count() == 0


def test_bucket_range_and_determinism(spark):
    d = _docs(spark)
    b = d.select(md5_bucket("doc_id", 1000).alias("b"))
    stats = b.agg(F.min("b").alias("lo"), F.max("b").alias("hi")).first()
    assert 0 <= stats.lo and stats.hi < 1000
    assert b.distinct().count() > 1  # actually spreads
