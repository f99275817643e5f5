"""Unit tests for PII redaction, repetition signals, and cross-document
n-gram overlap (the training-corpus quality additions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatacw1_spark.functions.text import redact_pii, tokens, word_ngrams


def _redact_one(spark, s: str) -> str:
    return spark.range(1).select(redact_pii(F.lit(s)).alias("r")).collect()[0].r


def test_redact_pii_emails(spark):
    assert (
        _redact_one(spark, "mail a.b+c_d%e@sub.example.co.uk now")
        == "mail <EMAIL> now"
    )
    assert _redact_one(spark, "x@y.io and z@w.org") == "<EMAIL> and <EMAIL>"


def test_redact_pii_phones(spark):
    assert _redact_one(spark, "call +1-555-0123 ok") == "call <PHONE> ok"
    assert _redact_one(spark, "tel 02079460000") == "tel <PHONE>"


def test_redact_pii_leaves_clean_text_alone(spark):
    clean = "no contact info here, just words and a-hyphen and 42"
    assert _redact_one(spark, clean) == clean


def test_redact_pii_email_wins_over_phone_digits(spark):
    # Digit-bearing local part must be consumed by the email match, not
    # left behind as a phone-shaped fragment.
    assert _redact_one(spark, "u12345678@example.org") == "<EMAIL>"


def test_repetition_signals_on_crafted_doc(spark):
    df = spark.createDataFrame([(1, "a a a b c")], "doc_id int, text string")
    words = df.select("doc_id", F.explode(tokens("text")).alias("w"))
    wc = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    row = (
        wc.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_words"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("top_cnt"),
        )
        .collect()[0]
    )
    assert (row.n_words, row.n_distinct, row.top_cnt) == (5, 3, 3)


def test_crossdoc_overlap_marks_shared_shingles(spark):
    # doc 1 and 2 share their full text -> every shingle duplicated;
    # doc 3 is unique -> zero duplicated shingles.
    rows = [(1, "w x y z"), (2, "w x y z"), (3, "p q r s")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    sh = df.select(
        "doc_id", F.explode(F.array_distinct(word_ngrams(tokens("text"), 3))).alias("g")
    )
    dfreq = sh.groupBy("g").agg(F.count(F.lit(1)).alias("dfq"))
    frac = (
        sh.join(dfreq, "g")
        .groupBy("doc_id")
        .agg(
            (F.sum(F.when(F.col("dfq") >= 2, 1).otherwise(0)) / F.count(F.lit(1))).alias("f")
        )
        .collect()
    )
    got = {r.doc_id: r.f for r in frac}
    assert got == {1: 1.0, 2: 1.0, 3: 0.0}
