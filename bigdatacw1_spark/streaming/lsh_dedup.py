"""Streaming NEAR-duplicate admission: MinHash-LSH over a micro-batch feed.

The admission gates in ingest.py reject only content-identical documents
(normalized fingerprint) or token-multiset-identical ones (SimHash).
This module rejects near duplicates — small edits, boilerplate variants —
against everything admitted so far, the corpus-wide guarantee a training
-data pipeline actually needs at ingest time.

Semantics per micro-batch (deterministic, order-free):
  1. Each doc gets a MinHash signature and its LSH band buckets
     (operators/dedup.band_rows — the SAME hashing as the batch path).
  2. A doc whose any-band bucket is already CLAIMED in the band store
     is a near-dup of an earlier admitted doc → rejected.
  3. Within the batch, docs are clustered by the band graph (connected
     components over lsh_candidate_pairs). A component touching any
     claimed bucket is rejected wholesale (its members are near-dups of
     a rejected doc's twin); an untouched component admits exactly its
     min-id representative.
  4. Admitted docs' buckets are appended to the band store; docs too
     short to shingle (< n tokens, no signature) are admitted as-is.

Why a parquet band store instead of Spark state-store state: the state
here is keyed by band bucket and must be consulted as a JOIN (a doc
probes b buckets at once), which mapGroupsWithState cannot express
without chaining stateful ops (unsupported after aggregation). A table
join per batch IS the scalable shape: one hash semi-join on
(band_idx, band_hash) per batch — broadcast-able while the batch is
small — and one append. At 100 TB the store would be bucketed by
band_hash (sources/sinks.write_bucketed) so the probe side shuffles
once and the store side never reshuffles; replay idempotency comes from
per-batch-id overwrite partitions, same as the windowed parquet sink.

No reference counterpart (the reference is batch-only); extension per
SURVEY.md §2.9/§2.11.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatacw1_spark.operators.dedup import (
    band_rows,
    lsh_candidate_pairs,
    minhash_signatures,
)
from bigdatacw1_spark.operators.graph import connected_components
from bigdatacw1_spark.streaming.statefs import check_store_path, delete_dir, list_batch_ids

_STORE_COLS = ["band_idx", "band_hash"]


def _read_band_store(spark: SparkSession, state_dir: str | None) -> DataFrame | None:
    if state_dir is None:
        return None
    # statefs resolves any FS the JVM can (file:, hdfs:, s3a:, ...) and
    # raises on unresolvable schemes — never a silently-empty store.
    if not list_batch_ids(spark, state_dir):
        return None
    return spark.read.option("basePath", state_dir).parquet(state_dir).select(*_STORE_COLS)


def admit_lsh_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    state_dir: str | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 18,
    bands: int = 6,
    ngram: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """One admission step on a STATIC frame. Returns (admitted_docs,
    new_band_rows); the caller persists both. Pure function of
    (batch, band store) — replaying the same batch against the same
    store yields the same admissions, which is what makes the per-batch
    overwrite sink exactly-once."""
    sigs = minhash_signatures(batch_df, text_col, id_col, num_hashes, ngram)
    sigs = sigs.localCheckpoint(eager=False)
    banded = band_rows(sigs, id_col, bands).localCheckpoint(eager=False)

    store = _read_band_store(spark, state_dir)
    if store is None:
        hit_docs = banded.select(id_col).limit(0)
    else:
        hit_docs = (
            banded.join(store, _STORE_COLS, "left_semi").select(id_col).distinct()
        )

    pairs = lsh_candidate_pairs(sigs, id_col, bands)
    cc = connected_components(pairs, src="a", dst="b")
    comp = (
        sigs.select(id_col)
        .join(cc, F.col(id_col) == cc["node"], "left")
        .select(id_col, F.coalesce("comp", F.col(id_col)).alias("comp"))
    )
    bad_comps = comp.join(hit_docs, id_col, "left_semi").select("comp").distinct()
    # Materialize the (small) survivor id set once: both outputs derive
    # from it, and without this the second write would replay the whole
    # signature+CC computation.
    survivors = comp.join(bad_comps, "comp", "left_anti").localCheckpoint()
    reps = survivors.groupBy("comp").agg(F.min(id_col).alias(id_col)).select(id_col)

    no_sig = batch_df.join(sigs.select(id_col), id_col, "left_anti")
    admitted = batch_df.join(reps, id_col, "left_semi").unionByName(no_sig)
    # Claim buckets for ALL survivors of admitted components, not just the
    # written representative: a non-rep member is collapsed into the rep,
    # and a later light edit of that member may collide only with the
    # member's own buckets — rep-only claims would admit it and weaken the
    # corpus-wide guarantee. Cost is marginal (same batch-sized semi-join);
    # recall strictly improves.
    new_bands = (
        banded.join(survivors.select(id_col), id_col, "left_semi")
        .select(*_STORE_COLS)
        .distinct()
    )
    return admitted, new_bands


def run_lsh_dedup_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 18,
    bands: int = 6,
    ngram: int = 3,
):
    """Drive admit_lsh_batch over a streaming document feed
    (availableNow). Admitted docs land in ``out_dir/batch_id=N``,
    claimed buckets in ``state_dir/batch_id=N`` — both overwrite-by-
    batch-id, so an at-least-once foreachBatch replay rewrites instead
    of duplicating, and a replayed batch recomputes against a store
    that already contains its own buckets only via its OWN batch_id
    partition (overwritten whole), never double-claimed."""
    check_store_path(spark, state_dir, "state_dir")
    check_store_path(spark, out_dir, "out_dir")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # A replayed batch must not see the buckets its earlier attempt
        # claimed: drop this batch_id's store partition before probing.
        own = os.path.join(state_dir, f"batch_id={batch_id}")
        delete_dir(spark, own)
        admitted, new_bands = admit_lsh_batch(
            spark,
            batch_df,
            state_dir,
            id_col=id_col,
            text_col=text_col,
            num_hashes=num_hashes,
            bands=bands,
            ngram=ngram,
        )
        admitted.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )
        new_bands.write.mode("overwrite").parquet(own)

    return (
        docs_stream.writeStream.foreachBatch(write_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir or out_dir + "_chk")
        .start()
    )


def read_admitted(spark: SparkSession, out_dir: str) -> DataFrame:
    """The admitted corpus across all batches (batch_id is an audit
    partition column, dropped here)."""
    return spark.read.option("basePath", out_dir).parquet(out_dir).drop("batch_id")
