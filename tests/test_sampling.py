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


def test_mixture_sample_matches_target_proportions(spark):
    from bigdatacw1_spark.operators.sampling import mixture_sample

    d = _docs(spark)
    weights = {"en": 4, "de": 2, "fr": 2, "es": 1, "zh": 1}
    out = mixture_sample(d, "doc_id", "lang", weights)
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    avail = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # No upsampling, every weighted language present.
    assert set(got) == set(weights)
    assert all(got[l] <= avail[l] for l in got)
    # Achieved mixture tracks the target within hash-bucket noise:
    # each language's share within ±60% relative of its target share
    # (sf0.001 strata are tens of docs, so quantization is coarse).
    total = sum(got.values())
    wsum = sum(weights.values())
    for lang, w in weights.items():
        assert abs(got[lang] / total - w / wsum) < 0.6 * (w / wsum) + 0.05, (lang, got)


def test_mixture_sample_keeps_binding_domain_whole(spark):
    from bigdatacw1_spark.operators.sampling import mixture_sample

    d = _docs(spark)
    avail = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    weights = {"en": 1, "zh": 1}  # zh is scarce: it binds; en downsamples to match
    out = mixture_sample(d, "doc_id", "lang", weights)
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got.get("zh", 0) >= int(avail["zh"] * 0.9)  # binding stratum ~whole (bucket floor)
    assert got["en"] < avail["en"]


def test_mixture_sample_ignores_absent_and_zero_weight_domains(spark):
    from bigdatacw1_spark.operators.sampling import mixture_sample

    d = _docs(spark)
    out = mixture_sample(d, "doc_id", "lang", {"en": 1, "klingon": 5, "de": 0})
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}


def test_dsir_scores_rank_target_language_higher(spark):
    """Documents from the target domain (lang='en') must land higher on
    average: the importance weight is literally a target-vs-raw
    log-likelihood ratio, so the target subset's mean score is positive
    and exceeds the non-target mean."""
    from pyspark.sql import functions as F

    from bigdatacw1_spark.operators.sampling import dsir_scores

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scored = dsir_scores(d, target_pred=F.col("lang") == "en").join(
        d.select("doc_id", "lang"), "doc_id"
    )
    means = {
        r["is_en"]: r["m"]
        for r in scored.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("dsir_score").alias("m"))
        .collect()
    }
    assert means[True] > 0 > means[False]
    assert means[True] > means[False]


def test_logreg_separates_and_eval_is_exact(spark):
    """The trained quality filter must actually learn the weak label
    (positives score higher), and binary_classifier_eval's AUC must
    equal a sequential average-rank Mann-Whitney computed in Python."""
    from bigdatacw1_spark.operators.sampling import (
        binary_classifier_eval,
        logreg_quality_scores,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scores = logreg_quality_scores(d, F.col("n_chars") >= 256, iters=10, lr=2.0)
    rows = scores.collect()
    pos = [r["p_hq"] for r in rows if r["y"] == 1]
    neg = [r["p_hq"] for r in rows if r["y"] == 0]
    assert sum(pos) / len(pos) > sum(neg) / len(neg)

    # sequential reference: average ranks over the sorted score list
    allr = sorted((r["p_hq"], r["y"]) for r in rows)
    ranks: dict[float, float] = {}
    i = 0
    while i < len(allr):
        j = i
        while j < len(allr) and allr[j][0] == allr[i][0]:
            j += 1
        avg = (i + 1 + j) / 2.0  # mean of ranks i+1 .. j
        ranks[allr[i][0]] = avg
        i = j
    r_pos = sum(ranks[s] for s, y in allr if y == 1)
    n_pos, n_neg = len(pos), len(neg)
    want_auc = (r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    got = binary_classifier_eval(scores).first()
    assert abs(got["auc"] - want_auc) < 1e-6
    assert got["n_pos"] == n_pos and got["n_neg"] == n_neg
    assert got["tp"] + got["fn"] == n_pos and got["fp"] + got["tn"] == n_neg
    # perfect-separation sanity: a scorer equal to the label has AUC 1
    perfect = scores.select("doc_id", "y", F.col("y").cast("double").alias("p_hq"))
    assert binary_classifier_eval(perfect).first()["auc"] == 1.0


def test_el2n_margin_is_abs_error_and_bounded(spark):
    from bigdatacw1_spark.operators.sampling import el2n_difficulty

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = el2n_difficulty(d, F.col("n_chars") >= 256, iters=3, lr=0.5).collect()
    for r in out:
        assert 0.0 <= r["margin"] <= 1.0
        # gradient norm multiplier is in [1, sqrt(3)] for features in [0,1]
        assert r["margin"] <= r["el2n"] <= r["margin"] * (3.0**0.5) + 1e-9
