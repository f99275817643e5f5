#!/usr/bin/env python
"""Corpus curation CLI: the composed training-data pipeline as a runnable
tool — C4 cleaning → normalized dedup → LSH near-dup removal →
entropy/length quality screen → Gopher composite gate → leak-free split → exact-substring
decontamination → parquet out, printing a per-stage funnel report.

    python scripts/curate_corpus.py [--sf-dir DIR] [--out DIR]

Every stage is the same operator the registry entries / integration test
use (tests/test_curation_pipeline.py); this script only chains them, so
the funnel it prints is the plan a 100 TB run would execute."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigdatacw1_spark.functions.text import (  # noqa: E402
    c4_line_filter,
    char_entropy,
    gopher_rules,
    tokens,
)
from bigdatacw1_spark.operators.dedup import (  # noqa: E402
    normalized_dup_groups,
    substr_decontaminate,
    verified_near_duplicates,
)
from bigdatacw1_spark.operators.sampling import train_test_split  # noqa: E402
from bigdatacw1_spark.session import get_spark  # noqa: E402
from bigdatacw1_spark.sources.catalog import load_table  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--out", default="/tmp/curated_corpus")
    ap.add_argument("--min-words", type=int, default=25)
    ap.add_argument("--min-entropy", type=float, default=3.0)
    ap.add_argument("--neardup-threshold", type=float, default=0.5)
    ap.add_argument("--test-fraction", type=float, default=0.2)
    args = ap.parse_args()

    spark = get_spark(app_name="curate-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    funnel: list[tuple[str, int]] = []

    docs = load_table(spark, args.sf_dir, "documents")
    funnel.append(("input", docs.count()))

    clean = c4_line_filter(docs, min_words=args.min_words, require_terminal_punct=False)
    funnel.append(("c4_clean", clean.count()))

    keep = normalized_dup_groups(clean).select(F.col("keep_id").alias("doc_id"))
    deduped = clean.join(keep, "doc_id")
    funnel.append(("exact_dedup", deduped.count()))

    losers = (
        verified_near_duplicates(deduped, threshold=args.neardup_threshold)
        .select(F.col("b").alias("doc_id"))
        .distinct()
    )
    survivors = deduped.join(losers, "doc_id", "left_anti")
    funnel.append(("neardup_removed", survivors.count()))

    screened = survivors.where(
        (char_entropy("text") >= args.min_entropy) & (F.size(tokens("text")) >= 10)
    )
    funnel.append(("quality_screen", screened.count()))

    gated = screened.where(gopher_rules("text")["keep"])
    funnel.append(("gopher_gate", gated.count()))

    split = train_test_split(gated, "doc_id", test_fraction=args.test_fraction)
    train = split.where(F.col("split") == "train")
    test = split.where(F.col("split") == "test")
    funnel.append(("train_split", train.count()))
    contaminated = substr_decontaminate(train, test).select("doc_id")
    final_train = train.join(contaminated, "doc_id", "left_anti")
    funnel.append(("train_decontaminated", final_train.count()))
    funnel.append(("test", test.count()))

    final_train.write.mode("overwrite").parquet(os.path.join(args.out, "train"))
    test.write.mode("overwrite").parquet(os.path.join(args.out, "test"))

    width = max(len(n) for n, _ in funnel)
    prev = None
    for name, n in funnel:
        drop = "" if prev is None or name == "test" else f"  (-{prev - n})"
        print(f"{name:<{width}}  {n:>8}{drop}")
        if name != "test":
            prev = n
    print(f"written: {args.out}/train, {args.out}/test")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
