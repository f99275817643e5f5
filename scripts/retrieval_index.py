#!/usr/bin/env python
"""Retrieval-stack CLI: build the sparse + dense indexes once, then
answer queries with BM25, exact cosine, and reciprocal-rank fusion —
the first-stage RAG ranker as a runnable tool.

    python scripts/retrieval_index.py [--sf-dir DIR] [--query "terms ..."] [--k K]

Stages (each is the same operator the registry entries verify):
  1. BM25 index stats (bm25_corpus_stats) — one bounded driver row,
     frozen as plan literals so scoring is stateless (streamable).
  2. Dense leg — exact cosine against the probe embedding (vec_id 0),
     stand-in for an encoder embedding of the query text.
  3. RRF fusion of the two top-K lists (1/(60+rank) each, FULL OUTER).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bigdatacw1_spark.functions.text import (  # noqa: E402
    bm25_corpus_stats,
    bm25_score_frozen,
)
from bigdatacw1_spark.functions.vector import as_double, cosine  # noqa: E402
from bigdatacw1_spark.operators.relational import stable_round  # noqa: E402
from bigdatacw1_spark.session import get_spark  # noqa: E402
from bigdatacw1_spark.sources.catalog import load_table  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--query", default="spark stream join")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark(app_name="retrieval-index")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, args.sf_dir, "documents")
    emb = load_table(spark, args.sf_dir, "embeddings")
    terms = [t for t in args.query.lower().split() if t]

    stats = bm25_corpus_stats(docs, terms)
    print(f"[1/3] BM25 index stats frozen: N={stats['n_docs']} avgdl={stats['avgdl']:.2f} df={stats['df']}")

    sparse = bm25_score_frozen(docs, stats, terms)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    sparse_top = (
        sparse.orderBy(F.desc("score"), "doc_id").limit(args.k * 2)
        .select("doc_id", F.row_number().over(w).cast("long").alias("sparse_rank"))
    )

    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).select("embedding").head()[0]]
    qlit = F.array(*[F.lit(x) for x in qvec])
    dense_top = (
        emb.select(F.col("vec_id").alias("doc_id"),
                   stable_round(cosine(as_double(F.col("embedding")), qlit), 6).alias("score"))
        .where(F.col("score").isNotNull())
        .orderBy(F.desc("score"), "doc_id").limit(args.k * 2)
        .select("doc_id", F.row_number().over(
            Window.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long").alias("dense_rank"))
    )
    print(f"[2/3] legs scored: sparse={sparse_top.count()} dense={dense_top.count()} candidates")

    rrf = F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("sparse_rank")), F.lit(0.0)) + \
        F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("dense_rank")), F.lit(0.0))
    fused = (
        sparse_top.join(dense_top, "doc_id", "full_outer")
        .select("doc_id", "sparse_rank", "dense_rank", stable_round(rrf, 6).alias("rrf"))
        .orderBy(F.desc("rrf"), "doc_id").limit(args.k)
    )
    print(f"[3/3] RRF fusion (top {args.k}):")
    for r in fused.collect():
        print(f"  doc {r.doc_id:>6}  rrf={r.rrf:.6f}  sparse={r.sparse_rank}  dense={r.dense_rank}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
