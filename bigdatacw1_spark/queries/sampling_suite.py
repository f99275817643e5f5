"""Deterministic-sampling queries (north-star extension, SURVEY.md §2.11).

Every query here is fully oracle-checked: the md5-bucket predicate is
bit-identical in DuckDB (``('0x'||substr(md5(k),1,8))::BIGINT``), so the
driver verifies the EXACT sampled row set, not just its size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatacw1_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
    train_test_split,
)
from bigdatacw1_spark.queries.registry import q
from bigdatacw1_spark.queries.registry import t as _t

# DuckDB rendering of operators/sampling.md5_bucket (B = 1_000_000).
_BUCKET = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '{salt}'), 1, 8))::BIGINT % 1000000)"


@q(
    "ext_hash_sample",
    oracle=f"""
        SELECT doc_id, lang, source
        FROM documents
        WHERE {_BUCKET.format(salt="")} < 100000
        ORDER BY doc_id
    """,
)
def ext_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% sample of documents by doc_id hash — the exact
    row set is oracle-verified, proving the predicate is engine-portable
    and rerun-stable (SURVEY.md §2.11 sampling)."""
    d = _t(spark, sf_dir, "documents")
    return hash_sample(d, "doc_id", 0.10).select("doc_id", "lang", "source").orderBy("doc_id")


@q(
    "ext_stratified_sample",
    oracle=f"""
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(MIN(doc_id) AS BIGINT) AS first_doc
        FROM documents
        WHERE {_BUCKET.format(salt="")} <
              CASE lang WHEN 'de' THEN 1000000 WHEN 'en' THEN 300000 WHEN 'zh' THEN 100000 ELSE 0 END
        GROUP BY lang
        ORDER BY lang
    """,
)
def ext_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: keep all German docs, 30% of
    English, 10% of Chinese, drop other languages — the downsample-the-
    dominant-language move of corpus curation, as one partition-local
    CASE predicate."""
    d = _t(spark, sf_dir, "documents")
    kept = stratified_hash_sample(
        d, "doc_id", "lang", {"de": 1.0, "en": 0.3, "zh": 0.1}, default_fraction=0.0
    )
    return (
        kept.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .orderBy("lang")
    )


@q(
    "ext_train_test_split",
    oracle=f"""
        SELECT CASE WHEN {_BUCKET.format(salt="split")} < 100000 THEN 'test' ELSE 'train' END AS split,
               lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents
        GROUP BY 1, 2
        ORDER BY split, lang
    """,
)
def ext_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-keyed 90/10 train/test tagging, counted per (split, lang).
    Because the tag is a pure function of doc_id, any other table keyed
    by doc_id splits consistently — no cross-split leakage when joining
    features to documents."""
    d = _t(spark, sf_dir, "documents")
    return (
        train_test_split(d, "doc_id", test_fraction=0.10)
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "lang")
    )


@q(
    "ext_hash_sample_n",
    oracle=f"""
        SELECT doc_id, lang
        FROM documents
        ORDER BY {_BUCKET.format(salt="")}, doc_id
        LIMIT 25
    """,
)
def ext_hash_sample_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size deterministic sample (bottom-25 by key hash) — the
    'give me exactly n uniform rows, reproducibly' primitive; plans as
    TakeOrderedAndProject, never a global sort."""
    from bigdatacw1_spark.operators.sampling import hash_sample_n

    d = _t(spark, sf_dir, "documents")
    return hash_sample_n(d, "doc_id", 25).select("doc_id", "lang")


@q(
    "ext_weighted_sample",
    oracle="""
        SELECT doc_id, n_chars,
               CAST(n_chars AS DOUBLE) /
                 (((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'ws'), 1, 8))::BIGINT) + 0.5)
                  / 4294967296.0) AS priority
        FROM documents
        ORDER BY priority DESC, doc_id
        LIMIT 200
    """,
)
def ext_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling (priority sampling, Duffield et
    al.): 200 documents drawn with probability ~proportional to length
    (n_chars) — the corpus-curation move of oversampling long documents
    — with the EXACT selected row set oracle-verified because priority
    = w/u is one IEEE division over an md5-derived uniform (no RNG, no
    ln). Plans as TakeOrderedAndProject: per-partition heaps, no global
    sort at any scale."""
    from bigdatacw1_spark.operators.sampling import weighted_sample_n

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample_n(d, "doc_id", "n_chars", 200, salt="ws").orderBy(
        F.desc("priority"), "doc_id"
    )


@q(
    "ext_mixture_sample",
    oracle=f"""
        WITH c AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang
        ), w(lang, w) AS (
            VALUES ('en', CAST(4 AS BIGINT)), ('de', CAST(2 AS BIGINT)),
                   ('fr', CAST(2 AS BIGINT)), ('es', CAST(1 AS BIGINT)),
                   ('zh', CAST(1 AS BIGINT))
        ), j AS (
            SELECT c.lang, c.n, w.w FROM c JOIN w ON c.lang = w.lang
        ), tw AS (
            SELECT CAST(SUM(w) AS BIGINT) AS tw FROM j
        ), tm AS (
            SELECT MIN(n * tw // w) AS tm FROM j CROSS JOIN tw
        ), th AS (
            SELECT lang, 1000000 * (tm * w // tw) // n AS thr
            FROM j CROSS JOIN tw CROSS JOIN tm
        )
        SELECT d.doc_id, d.lang, d.source
        FROM documents d JOIN th ON d.lang = th.lang
        WHERE {_BUCKET.format(salt="mix")} < th.thr
        ORDER BY d.doc_id
    """,
)
def ext_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling (operators/sampling.mixture_sample): draw
    the largest corpus matching a 4:2:2:1:1 en/de/fr/es/zh target
    mixture without replacement — the binding language is kept whole,
    the rest hash-downsampled to proportion. Thresholds are derived in
    pure BIGINT arithmetic from the per-language counts, so the oracle
    recomputes them exactly and verifies the EXACT sampled row set."""
    from bigdatacw1_spark.operators.sampling import mixture_sample

    d = _t(spark, sf_dir, "documents")
    kept = mixture_sample(
        d, "doc_id", "lang", {"en": 4, "de": 2, "fr": 2, "es": 1, "zh": 1}
    )
    return kept.select("doc_id", "lang", "source").orderBy("doc_id")


@q(
    "ext_dsir_select",
    oracle="""
        WITH tk AS (
            SELECT doc_id, lang,
                   LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\\s+'), w -> w <> '') AS toks
            FROM documents
        ), tok AS (
            SELECT doc_id, lang, UNNEST(toks) AS w FROM tk
        ), b AS (
            SELECT doc_id, lang,
                   ('0x' || SUBSTR(MD5(w), 1, 8))::BIGINT % 16 AS bucket
            FROM tok
        ), rawc AS (
            SELECT bucket, COUNT(*) AS nr FROM b GROUP BY bucket
        ), tgtc AS (
            SELECT bucket, COUNT(*) AS nt FROM b WHERE lang = 'en' GROUP BY bucket
        ), grid AS (
            SELECT UNNEST(GENERATE_SERIES(0, 15)) AS bucket
        ), tot AS (
            SELECT (SELECT COUNT(*) FROM b) AS xr,
                   (SELECT COUNT(*) FROM b WHERE lang = 'en') AS xt
        ), lr AS (
            SELECT g.bucket,
                   LN((COALESCE(t.nt, 0) + 1.0) / (tot.xt + 16.0))
                 - LN((COALESCE(r.nr, 0) + 1.0) / (tot.xr + 16.0)) AS lr
            FROM grid g
            LEFT JOIN tgtc t ON g.bucket = t.bucket
            LEFT JOIN rawc r ON g.bucket = r.bucket
            CROSS JOIN tot
        ), dc AS (
            SELECT doc_id, bucket, COUNT(*) AS cnt FROM b GROUP BY doc_id, bucket
        ), terms AS (
            SELECT dc.doc_id, dc.bucket, dc.cnt * lr.lr AS term
            FROM dc JOIN lr ON dc.bucket = lr.bucket
        ), s AS (
            SELECT doc_id, LIST_SUM(LIST(term ORDER BY bucket)) AS score
            FROM terms GROUP BY doc_id
        ), r AS (
            SELECT s.doc_id, d.lang,
                   FLOOR(s.score * 10000.0 + 0.5) / 10000.0 AS dsir_score
            FROM s JOIN documents d USING (doc_id)
        )
        SELECT doc_id, lang, dsir_score
        FROM r
        ORDER BY dsir_score DESC, doc_id
        LIMIT 40
    """,
)
def ext_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al., NeurIPS 2023 — operators/
    sampling.dsir_scores): rank raw documents by the log-likelihood
    ratio between a hashed-unigram LM of the TARGET domain (here:
    lang='en') and of the whole corpus, then keep the top 40. This is
    the classifier-free way to tilt a 100 TB crawl toward a domain: one
    tokenize+explode pass, three hash aggregates, and a 16-row model
    broadcast back onto per-doc counts — the corpus never shuffles
    twice. Engine-exact: md5 bucketing, sorted per-doc float fold,
    identical ln/division shapes, stable rounding (the top-40 cut
    happens on the ROUNDED score with a doc_id tie-break in both
    engines)."""
    from bigdatacw1_spark.operators.sampling import dsir_scores

    d = _t(spark, sf_dir, "documents")
    scored = dsir_scores(d, target_pred=F.col("lang") == "en")
    return (
        scored.join(d.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "dsir_score")
        .orderBy(F.desc("dsir_score"), F.asc("doc_id"))
        .limit(40)
    )
