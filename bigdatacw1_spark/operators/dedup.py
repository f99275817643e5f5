"""Deduplication operators (north-star extension, SURVEY.md §2.11).

Four families, all expressed as compositions of built-in DataFrame ops —
no Python in the hot path, every shuffle keyed so the heavy lifting is
map-side:

  exact          — hash-groupBy on (a digest of) the full text
  normalized     — same, after case/whitespace folding
  minhash + LSH  — shingle → K minhashes → band → bucket-join candidates
  simhash        — 64-bit sign-of-weighted-bits signature
  n-gram Jaccard — banded self-join + set-overlap verification

At 100 TB: the LSH band join is the only pairwise step and its key
(band_idx, band_hash) distributes uniformly by construction; exact/
normalized dedup are single aggregations with map-side combine; simhash
is a single aggregation over exploded tokens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdatacw1_spark.functions.text import normalized_fingerprint, tokens, word_ngrams
from bigdatacw1_spark.operators.relational import fan_out, int_lit_array, stable_round


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: sha256-digest the text, keep the minimum id
    as canonical representative. Output: (text_sha, keep_id, n_copies)."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("text_sha"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def normalized_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-exact duplicates after case/whitespace normalization."""
    return (
        df.groupBy(normalized_fingerprint(text_col).alias("fingerprint"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _seeded_hash(shingle: Column, seed: int) -> Column:
    # xxhash64 has a fixed seed in the function API; vary it by mixing in
    # a per-function integer argument (multi-arg xxhash64 chains hashes —
    # cheaper than string concat). Deterministic across runs/partitionings.
    return F.xxhash64(F.lit(seed), shingle)


def shingle_sets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    tokens_col: str | None = None,
) -> DataFrame:
    """(id, sh: array<string>) of DISTINCT word n-gram shingles per doc.
    Fanned out (projected to id+text) so the CPU-bound shingling uses
    every core even when the input is one small file.

    ``tokens_col`` (round 13, guide §5): when the caller already holds a
    tokenized — typically fan-out-spread and checkpointed — frame, name
    its token-array column and the tokenize pass (and the fan_out) is
    skipped; the shingles are the same ``word_ngrams`` over the same
    token arrays, so results are identical. This is how the
    method-agreement audit shares ONE tokenization across its four
    pair pipelines instead of re-scanning and re-tokenizing per method."""
    if tokens_col is not None:
        return df.select(
            F.col(id_col),
            F.array_distinct(word_ngrams(F.col(tokens_col), ngram)).alias("sh"),
        )
    return fan_out(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.array_distinct(word_ngrams(tokens(text_col), ngram)).alias("sh"),
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 18,
    ngram: int = 3,
) -> DataFrame:
    """MinHash signatures over word n-gram shingles.

    Computed entirely PER ROW — ``array_min(transform(sh, hash_i))`` for
    each of the K hash functions — so signature generation is a narrow
    map with NO shuffle at any scale (the earlier explode+groupBy form
    shuffled every shingle). Docs with no shingle (< n tokens) drop out,
    matching the exploded formulation. Output: (id, sig array<long> of K)."""
    shingled = shingle_sets(df, text_col, id_col, ngram).where(F.size("sh") > 0)
    return _sigs_from_shingles(shingled, id_col, num_hashes)


def _hash_i(seed: int):
    # MUST be a 1-arg lambda: pyspark dispatches on lambda ARITY, and a
    # 2-param `lambda s, i=seed` is treated as the (element, index) form —
    # the array POSITION silently overrides the seed default, collapsing
    # all K hash functions into one position-seeded hash (near-dups with
    # shifted shingle order then NEVER collide; caught by the recall
    # invariant in tests/test_extensions.py).
    return lambda s: _seeded_hash(s, seed)


def _sigs_from_shingles(shingled: DataFrame, id_col: str, num_hashes: int) -> DataFrame:
    mins = [
        F.array_min(F.transform(F.col("sh"), _hash_i(i))) for i in range(num_hashes)
    ]
    return shingled.select(id_col, F.array(*mins).alias("sig"))


def band_rows(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 6,
) -> DataFrame:
    """(id, band_idx, band_hash): each signature split into ``bands``
    bands, each band hashed to its LSH bucket id. The shared banding
    step behind lsh_candidate_pairs (batch self-join) and the streaming
    band-store admission (streaming/lsh_dedup.py) — both sides MUST
    hash bands identically, so it lives here once."""
    sig_len_expr = F.size(F.col("sig"))
    rows_per_band = F.floor(sig_len_expr / bands).cast("int")
    return signatures.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(",", F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)),
                    b,
                ),
            )
        ).alias("band_idx", "band_hash"),
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 6,
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` bands, hash each
    band, and self-join on (band_idx, band_hash) — docs sharing any band
    bucket become candidate pairs.

    Tuning: with K hashes and b bands (r = K/b rows per band), a pair
    with Jaccard j collides in a band with probability j^r — the default
    (K=18, b=6, r=3) targets the ~0.5 threshold; r=2 floods the candidate
    set with j≈0.05 noise on mildly-self-similar corpora (measured 25×
    more candidates at sf0.1). The join is keyed by the bucket id, so
    work is Σ bucket² — never a global cross join.

    Output: (a, b) with a < b, distinct."""
    # Materialize the signatures ONCE before the self-join (round 13,
    # guide §5 / r12 verdict item 7): at bench scale the planner picks a
    # BroadcastHashJoin whose build side would otherwise RE-COMPUTE the
    # whole shingle+minhash pipeline that produced ``signatures`` — the
    # lazy localCheckpoint lets whichever side runs first store the
    # computed partitions and the other side read them back, so the
    # banding subtree executes once. band_rows itself (a posexplode of K
    # longs) is re-derived per side, which is the cheap part. Same
    # discipline simhash_pairs already applies to its signature frame.
    signatures = signatures.localCheckpoint(eager=False)
    banded = band_rows(signatures, id_col, bands)
    left = banded.select("band_idx", "band_hash", F.col(id_col).alias("a"))
    right = banded.select(
        F.col("band_idx").alias("bi_r"), F.col("band_hash").alias("bh_r"), F.col(id_col).alias("b")
    )
    pairs = left.join(
        right,
        (left["band_idx"] == right["bi_r"])
        & (left["band_hash"] == right["bh_r"])
        & (left["a"] < right["b"]),
    )
    return pairs.select("a", "b").dropDuplicates()


def verified_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 8,
    ngram: int = 3,
) -> DataFrame:
    """The production near-dup pipeline: MinHash+LSH candidate generation
    followed by exact Jaccard verification of ONLY the candidate pairs.

    This is the shape that holds at 100 TB: LSH cost is linear in corpus
    size (one explode + one bucket shuffle), and the quadratic exact step
    runs on the candidate set, which LSH keeps tiny at high thresholds.
    Contrast with jaccard_pairs, whose inverted-index join degrades when
    shingle document-frequency is high.

    Verification re-shingles ONLY candidate documents: the candidate
    pairs (small — that is LSH's whole point) are materialized once via
    localCheckpoint, their ids semi-join-prune the corpus (broadcastable,
    so the corpus never shuffles), and the exact-Jaccard join touches
    just those rows. The alternative — joining candidate ids against the
    full shingled corpus — shuffles every document's shingle array twice,
    which is exactly the full-corpus pass LSH exists to avoid. Measured
    at sf0.1 the prune costs ~0.3s over the naive join (5000 docs
    shingle in 0.4s, so recomputing beats pruning locally); the
    crossover is wherever shingling the corpus stops being free, i.e.
    any production scale.

    Output: (a, b, jaccard) for candidate pairs with jaccard >= threshold.
    """
    shingles = shingle_sets(df, text_col, id_col, ngram)
    sigs = _sigs_from_shingles(shingles.where(F.size("sh") > 0), id_col, num_hashes)
    cands = lsh_candidate_pairs(sigs, id_col, bands).localCheckpoint(eager=False)
    # No .distinct() on the exploded ids: the left-semi probe makes the
    # duplicate ids semantically harmless (a semi join emits each probe
    # row at most once however many build rows match), so the distinct
    # was a whole extra shuffle stage for zero semantic effect (guide
    # §2.4 — remove shuffles outright; round-12 measured one fewer job).
    # Note the broadcast itself still SHIPS the duplicates — Spark's
    # HashedRelation stores duplicate build rows — growing the payload
    # from |distinct ids| to 2·|candidate pairs|; both are
    # candidate-sized (LSH keeps candidates tiny), and `cands` is
    # broadcast in full just below anyway, so the asymptotics are
    # unchanged (round-13 ADVICE correction of the r12 comment).
    cand_ids = cands.select(F.explode(F.array("a", "b")).alias(id_col))
    cand_sh = shingle_sets(
        df.join(F.broadcast(cand_ids), id_col, "left_semi"), text_col, id_col, ngram
    )
    a_sh = cand_sh.select(F.col(id_col).alias("a"), F.col("sh").alias("sh_a"))
    b_sh = cand_sh.select(F.col(id_col).alias("b"), F.col("sh").alias("sh_b"))
    # The candidate set is small by construction (that is LSH's point), so
    # broadcasting it keeps the shingled candidate docs from shuffling at
    # all: both verification joins stream map-side.
    paired = F.broadcast(cands).join(a_sh, "a").join(b_sh, "b")
    la, lb = F.size("sh_a"), F.size("sh_b")
    lu = F.size(F.array_distinct(F.concat(F.col("sh_a"), F.col("sh_b"))))
    jacc = stable_round((la + lb - lu) / F.greatest(lu, F.lit(1)), 4)
    return paired.select("a", "b", jacc.alias("jaccard")).where(F.col("jaccard") >= threshold)


def incremental_admission(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 8,
    ngram: int = 3,
) -> DataFrame:
    """Batch-incremental near-dup ADMISSION: screen a NEW batch of
    documents against an EXISTING corpus (and against itself) without
    ever re-pairing the corpus — the shape a continuously-ingesting
    training-data pipeline actually runs. ``verified_near_duplicates``
    answers "which pairs in this corpus are dups"; this answers "which
    of today's N new docs may enter a corpus of M docs", and its cost
    must scale with N, not M².

    Plan: the corpus's band rows are a precomputable, persistable INDEX
    (band_rows output keyed by (band_idx, band_hash) — in production,
    written bucketed on band_hash once and appended per admitted batch).
    The new batch computes its own signatures (linear in N), probes the
    index with one equi join (shuffle sized by the batch side), and only
    the surviving candidate pairs pay exact-Jaccard verification.
    Batch-internal dups resolve keep-first (lowest id wins), so an
    admitted batch never introduces a pair the next probe would flag.

    Output, one row per batch doc: (doc_id, n_dup_corpus, n_dup_batch,
    admitted) — admitted ⇔ no verified match ≥ threshold against either
    the corpus or an earlier-id batch doc.
    """
    c_sh_all = shingle_sets(corpus, text_col, id_col, ngram)
    c_sigs = _sigs_from_shingles(c_sh_all.where(F.size("sh") > 0), id_col, num_hashes)

    # Probe the corpus band index with the batch's band rows. The join is
    # keyed by the bucket id; the batch side is the small prober.
    c_bands = band_rows(c_sigs, id_col, bands)
    b_sigs, b_bands = _batch_bands(batch, text_col, id_col, num_hashes, bands, ngram)
    cand_bc = (
        b_bands.select("band_idx", "band_hash", F.col(id_col).alias("b"))
        .join(c_bands.select("band_idx", "band_hash", F.col(id_col).alias("a")),
              ["band_idx", "band_hash"])
        .select("a", "b")
        .dropDuplicates()
    )
    # Batch-internal candidates: standard LSH self-join on the batch only.
    cand_bb = lsh_candidate_pairs(b_sigs, id_col, bands)
    return _admission_report(
        corpus, batch, cand_bc, cand_bb, text_col, id_col, threshold, ngram
    )


def _batch_bands(
    batch: DataFrame, text_col: str, id_col: str, num_hashes: int, bands: int, ngram: int
):
    b_sh = shingle_sets(batch, text_col, id_col, ngram)
    b_sigs = _sigs_from_shingles(b_sh.where(F.size("sh") > 0), id_col, num_hashes)
    return b_sigs, band_rows(b_sigs, id_col, bands)


def _admission_report(
    corpus: DataFrame,
    batch: DataFrame,
    cand_bc: DataFrame,
    cand_bb: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    ngram: int,
) -> DataFrame:
    """Exact-Jaccard verification of admission candidates → per-batch-doc
    report. Corpus shingling is PRUNED to candidate ids via a broadcast
    semi-join before any shingle is computed (the verified_near_duplicates
    discipline): the candidate set is small by LSH construction, so the
    corpus never pays a full re-shingle for verification."""
    cand_bc = cand_bc.localCheckpoint(eager=False)
    cand_ids = cand_bc.select(F.col("a").alias(id_col)).distinct()
    c_sh = shingle_sets(
        corpus.join(F.broadcast(cand_ids), id_col, "left_semi"), text_col, id_col, ngram
    )
    b_sh = shingle_sets(batch, text_col, id_col, ngram)

    def verified(cands: DataFrame, a_side: DataFrame) -> DataFrame:
        a_sh = a_side.select(F.col(id_col).alias("a"), F.col("sh").alias("sh_a"))
        bb_sh = b_sh.select(F.col(id_col).alias("b"), F.col("sh").alias("sh_b"))
        paired = F.broadcast(cands).join(a_sh, "a").join(bb_sh, "b")
        la, lb = F.size("sh_a"), F.size("sh_b")
        lu = F.size(F.array_distinct(F.concat(F.col("sh_a"), F.col("sh_b"))))
        jacc = stable_round((la + lb - lu) / F.greatest(lu, F.lit(1)), 4)
        return paired.select("a", "b", jacc.alias("jaccard")).where(
            F.col("jaccard") >= threshold
        )

    n_corpus = (
        verified(cand_bc, c_sh)
        .groupBy("b").agg(F.count(F.lit(1)).alias("n_dup_corpus"))
    )
    # Keep-first within the batch: the LATER id of a verified pair is the dup.
    n_batch = (
        verified(cand_bb, b_sh)
        .groupBy("b").agg(F.count(F.lit(1)).alias("n_dup_batch"))
    )
    return (
        batch.select(F.col(id_col))
        .join(n_corpus.withColumnRenamed("b", id_col), id_col, "left")
        .join(n_batch.withColumnRenamed("b", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_dup_corpus", F.lit(0)).alias("n_dup_corpus"),
            F.coalesce("n_dup_batch", F.lit(0)).alias("n_dup_batch"),
            (
                F.coalesce("n_dup_corpus", F.lit(0))
                + F.coalesce("n_dup_batch", F.lit(0))
                == 0
            ).alias("admitted"),
        )
    )


def build_band_index(
    corpus: DataFrame,
    table_name: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 8,
    ngram: int = 3,
    num_buckets: int = 32,
) -> None:
    """Materialize the corpus's LSH band rows as a PERSISTED, BUCKETED
    index table — the piece that makes admission a service instead of a
    job: built once over the corpus, appended per admitted batch, probed
    by every incoming batch with no corpus-side shuffle (the table is
    bucketed on band_hash, so the probe join only exchanges the batch
    side). band_hash folds the band index into the hash seed
    (band_rows), so the single-column bucket key is sufficient; the rare
    cross-band seed collision only adds a candidate that exact
    verification discards."""
    from bigdatacw1_spark.sources.sinks import write_bucketed

    _, rows = _batch_bands(corpus, text_col, id_col, num_hashes, bands, ngram)
    write_bucketed(rows, table_name, ["band_hash"], num_buckets, sort_cols=["band_hash"])


def admit_batch(
    spark,
    table_name: str,
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 8,
    ngram: int = 3,
    num_buckets: int = 32,
    append: bool = True,
) -> DataFrame:
    """Admission against the PERSISTED band index (build_band_index):
    probe → verify → report, then append the admitted docs' band rows so
    the next batch screens against them too. ``corpus`` supplies text
    only for the exact-verification step (pruned to candidate ids) and
    must cover every doc the index currently holds — i.e. the original
    corpus plus previously admitted batches; the candidate join itself
    reads the index, never the corpus. Returns the same report schema as
    incremental_admission; with ``append`` the index after the call
    covers corpus ∪ admitted batch docs."""
    idx = spark.table(table_name)
    b_sigs, b_bands = _batch_bands(batch, text_col, id_col, num_hashes, bands, ngram)
    cand_bc = (
        b_bands.select("band_hash", F.col(id_col).alias("b"))
        .join(idx.select("band_hash", F.col(id_col).alias("a")), "band_hash")
        .select("a", "b")
        .dropDuplicates()
    )
    cand_bb = lsh_candidate_pairs(b_sigs, id_col, bands)
    report = _admission_report(
        corpus, batch, cand_bc, cand_bb, text_col, id_col, threshold, ngram
    ).localCheckpoint(eager=False)
    if append:
        admitted_ids = report.where(F.col("admitted")).select(id_col)
        new_rows = b_bands.join(F.broadcast(admitted_ids), id_col, "left_semi")
        (
            new_rows.write.mode("append")
            .bucketBy(num_buckets, "band_hash")
            .sortBy("band_hash")
            .format("parquet")
            .saveAsTable(table_name)
        )
    return report


def contrastive_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    n_buckets: int = 64,
    salt: str = "neg",
) -> DataFrame:
    """Training-pair ASSEMBLY for embedding/retrieval models: one row per
    verified near-duplicate pair (anchor, positive) plus a reproducible
    hard-negative drawn from the corpus — the (a, p, n) triple format
    contrastive losses consume.

    Positives come from the scale-safe LSH pipeline
    (verified_near_duplicates). Negatives must be "random but
    deterministic" WITHOUT a global sort or per-anchor corpus scan, so
    the draw is bucketed: every doc hashes into one of ``n_buckets``
    md5-derived buckets; each bucket keeps its 3 smallest (md5, id) docs
    (a bucket-partitioned window over a vocabulary-sized table →
    broadcastable); the anchor probes ONE bucket (a different salt, so
    probe and placement are independent) and takes the first candidate
    that is neither itself nor one of its near-dup partners. NULL
    negative only if the probed bucket is empty or exhausted (bounded,
    loud in the output rather than silently re-sampled).
    """
    from pyspark.sql import Window

    from bigdatacw1_spark.operators.sampling import md5_bucket

    # pos feeds both the triples and the partner-exclusion sets; truncate
    # the LSH lineage once so the verification pipeline runs once, not
    # once per consumer.
    pos = verified_near_duplicates(df, text_col, id_col, threshold).localCheckpoint(
        eager=False
    )

    ids = df.select(id_col)
    ranked = ids.select(
        F.col(id_col),
        md5_bucket(id_col, n_buckets, salt).alias("bkt"),
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))).alias("h"),
    )
    w = Window.partitionBy("bkt").orderBy("h", id_col)
    bucket_cands = (
        ranked.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .groupBy("bkt")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("rn", F.col(id_col).alias("cid")))),
                lambda s: s["cid"],
            ).alias("cands")
        )
    )
    partners = (
        pos.select(F.col("a").alias("anchor"), F.col("b").alias("p"))
        .union(pos.select(F.col("b").alias("anchor"), F.col("a").alias("p")))
        .groupBy("anchor")
        .agg(F.collect_set("p").alias("ps"))
    )
    triples = (
        pos.select(F.col("a").alias("anchor"), F.col("b").alias("positive"))
        .withColumn("bkt", md5_bucket("anchor", n_buckets, "probe" + salt))
        .join(F.broadcast(bucket_cands), "bkt", "left")
        .join(partners, "anchor", "left")
        .select(
            "anchor",
            "positive",
            F.try_element_at(
                F.filter(
                    F.coalesce("cands", F.array().cast("array<long>")),
                    lambda c: (c != F.col("anchor"))
                    & ~F.array_contains(F.coalesce("ps", F.array().cast("array<long>")), c),
                ),
                F.lit(1),
            ).alias("negative"),
        )
    )
    return triples


def span_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    stride: int = 10,
) -> DataFrame:
    """Token-span fingerprints for EXACT-substring dedup (the ExactSubstr
    pass of Lee et al., "Deduplicating Training Data Makes Language
    Models Better", ACL 2022): slide a ``window``-token window with
    ``stride`` over each document and md5 the joined span. Whole-doc and
    near-dup passes miss PARTIAL copies — a quoted paragraph, boilerplate
    license block, or template intro shared verbatim across otherwise
    distinct documents; span fingerprints catch exactly those.

    A document shorter than ``window`` contributes one span (its full
    text), so every doc is representable. Output: (id, span_idx,
    span_md5) — one narrow map + posexplode, no shuffle; downstream
    aggregations key on span_md5. md5 (not xxhash) so the DuckDB oracle
    derives identical fingerprints.

    At 100 TB: rows out ≈ tokens/stride per doc (~n_tokens/10), each row
    ~50 bytes — the same order as the shingle explode the MinHash path
    already pays; the duplicate-span groupBy combines map-side since
    genuinely duplicated spans are rare.
    """
    toks = tokens(text_col)
    n_spans = F.greatest(
        F.floor((F.size(toks) - F.lit(window)) / F.lit(stride)).cast("int") + 1,
        F.lit(1),
    )
    spans = F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda i: F.md5(F.array_join(F.slice(toks, i * stride + 1, window), " ")),
    )
    return fan_out(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.posexplode(spans).alias("span_idx", "span_md5"),
    )


def span_dup_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    stride: int = 10,
) -> DataFrame:
    """Per-document exact-substring duplication report: how many of a
    doc's token spans appear verbatim in at least one OTHER document.
    ``dup_frac`` ~ 1.0 flags wholesale copies; mid-range values flag
    shared boilerplate the near-dup passes under-weight. Two shuffles:
    one on span_md5 (count distinct docs per span), one back on the doc
    id — both map-side combinable."""
    fps = span_fingerprints(df, text_col, id_col, window, stride)
    # distinct-doc count per span as an AGGREGATE (map-side combinable),
    # not a window collect_set (which would materialize per-span doc sets)
    span_docs = fps.groupBy("span_md5").agg(
        F.count_distinct(id_col).alias("__span_docs")
    )
    marked = fps.join(span_docs, "span_md5")
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("__span_docs") > 1, 1).otherwise(0)).alias("n_dup_spans"),
        )
        .withColumn(
            "dup_frac",
            stable_round(F.col("n_dup_spans") / F.col("n_spans"), 4),
        )
    )


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash: hash each token to 64 bits; for each bit position
    sum +1/-1 across tokens; the sign per position forms the signature.
    Single explode + single aggregation (64 conditional sums fused in one
    hash-aggregate pass). Output: (id, simhash long)."""
    tok = fan_out(df.select(id_col, text_col)).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    )
    h = F.xxhash64(F.col("tok"))
    bit_sums = [
        F.sum(F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{i}")
        for i in range(64)
    ]
    agged = tok.groupBy(id_col).agg(*bit_sums)
    sig = None
    for i in range(64):
        term = F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig.bitwiseXOR(term)
    return agged.select(id_col, sig.alias("simhash"))


def simhash60_md5(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """60-bit token-SET SimHash with an md5-derived token hash — the
    cross-engine-REPRODUCIBLE variant of simhash64 (which uses xxhash64
    and therefore can only be invariant-checked): every bit is the
    majority vote of the corresponding token-hash bit, md5 is
    bit-identical in any engine, so a SQL oracle recomputes the exact
    signature. 60 bits (15 hex chars) keeps the value positive in a
    signed BIGINT in both engines. Ties (even token count, split vote)
    resolve to 1 in both. Cost: 60 counted traversals of the per-doc
    token-hash array — heavier than simhash64's single pass; use this
    where verifiability matters, simhash64 in the hot path."""
    toks = F.array_distinct(tokens(F.col(text_col)))
    hs = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    )
    n = F.size(hs)
    sig = F.lit(0).cast("long")
    for b in range(60):
        cnt = F.size(F.filter(hs, lambda x: F.shiftright(x, b) % 2 == 1))
        sig = sig + F.when(2 * cnt >= n, F.lit(2 ** b).cast("long")).otherwise(F.lit(0))
    return df.select(F.col(id_col), sig.alias("sig"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    chunk_bits: int = 15,
) -> DataFrame:
    """EXACT SimHash near-dup pairs via Manku-style chunk bucketing:
    split the 60-bit signature into 60/chunk_bits chunks; any pair
    within Hamming distance ``max_hamming`` differs in at most
    max_hamming chunks, so with chunks > max_hamming the PIGEONHOLE
    principle guarantees they share at least one chunk — candidate
    recall is exactly 1.0 BY CONSTRUCTION, not probabilistically (the
    contrast with MinHash banding). Candidates then pay one xor+popcount
    verification. Defaults give 4 chunks for Hamming <= 3, the classic
    web-dedup operating point. Join work is Σ bucket² over 2^chunk_bits
    buckets per chunk position; hot buckets (boilerplate-heavy corpora)
    are bounded the same way as jaccard_pairs' df cap — raise
    chunk_bits or pre-split hot chunks at production scale.

    Output: (a, b, hamming) with a < b, hamming <= max_hamming.
    """
    n_chunks = 60 // chunk_bits
    if n_chunks <= max_hamming:
        raise ValueError(
            f"need more than {max_hamming} chunks for exact recall; "
            f"got {n_chunks} ({chunk_bits}-bit chunks of a 60-bit signature)"
        )
    sigs = simhash60_md5(df, text_col, id_col).localCheckpoint(eager=False)
    chunks = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    (F.shiftright("sig", i * chunk_bits) % F.lit(2 ** chunk_bits))
                    for i in range(n_chunks)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    left = chunks.select("chunk_idx", "chunk_val", F.col(id_col).alias("a"))
    right = chunks.select(
        F.col("chunk_idx").alias("ci_r"),
        F.col("chunk_val").alias("cv_r"),
        F.col(id_col).alias("b"),
    )
    cands = (
        left.join(
            right,
            (left["chunk_idx"] == right["ci_r"])
            & (left["chunk_val"] == right["cv_r"])
            & (left["a"] < right["b"]),
        )
        .select("a", "b")
        .dropDuplicates()
    )
    a_sig = sigs.select(F.col(id_col).alias("a"), F.col("sig").alias("sig_a"))
    b_sig = sigs.select(F.col(id_col).alias("b"), F.col("sig").alias("sig_b"))
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cands.join(a_sig, "a")
        .join(b_sig, "b")
        .select("a", "b", ham.cast("int").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_col: str = "source",
    ngram: int = 3,
    threshold: float = 0.05,
    max_shingle_df: int | None = 1000,
    tokens_col: str | None = None,
) -> DataFrame:
    """Word-n-gram Jaccard similarity for document pairs within a blocking
    bucket (e.g. same source), via a sparse inverted-index join:

      1. explode distinct shingles → (doc, bucket, shingle)
      2. self-join on (bucket, shingle), a < b → one row per SHARED shingle
      3. count rows per pair = |A∩B|; |A∪B| = |A|+|B|-|A∩B|

    Only pairs sharing at least one shingle are ever materialized — pairs
    with Jaccard 0 never exist, so for any threshold > 0 this is exactly
    equivalent to the all-pairs formulation while doing orders of
    magnitude less work (the all-pairs variant was 65 s at sf0.1; this is
    the shape that survives 100 TB: one shuffle keyed by shingle, one by
    pair).

    Skew guard: a shingle appearing in k docs of one bucket fans out k²
    pair rows, so ``max_shingle_df`` drops shingles whose per-bucket
    document frequency exceeds the cap BEFORE the pair join (standard
    stop-shingle removal — boilerplate that ubiquitous carries no
    near-dup signal anyway). The cap is applied before doc sizes are
    counted, so inclusion-exclusion stays internally consistent over the
    reduced shingle universe; when no shingle exceeds the cap the result
    is bit-identical to the uncapped run (the observed max df at sf0.1
    is 6 vs the default cap of 1000, so the driver-oracle entry is
    unaffected; tests pin the capped fan-out bound with a pathological
    shingle). One extra exchange on the same (bucket, shingle) key the
    pair join already shuffles on. ``None`` disables the guard.

    Output: (a, b, jaccard) for pairs ≥ threshold, a < b."""
    from pyspark.sql import Window

    if tokens_col is not None:  # pre-tokenized, pre-spread input (see shingle_sets)
        grams = word_ngrams(F.col(tokens_col), ngram)
    else:
        df = fan_out(df.select(id_col, bucket_col, text_col))
        grams = word_ngrams(tokens(text_col), ngram)
    shingled = df.select(
        F.col(id_col),
        F.col(bucket_col).alias("bucket"),
        F.explode(F.array_distinct(grams)).alias("shingle"),
    )
    if max_shingle_df is not None:
        w_df = Window.partitionBy("bucket", "shingle")
        shingled = (
            shingled.withColumn("__df", F.count(F.lit(1)).over(w_df))
            .where(F.col("__df") <= max_shingle_df)
            .drop("__df")
        )
    sizes = shingled.groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("n_sh"))
    left = shingled.select(
        F.col("bucket"), F.col("shingle"), F.col(id_col).alias("a")
    )
    right = shingled.select(
        F.col("bucket").alias("bucket_r"), F.col("shingle").alias("shingle_r"), F.col(id_col).alias("b")
    )
    common = (
        left.join(
            right,
            (left["bucket"] == right["bucket_r"])
            & (left["shingle"] == right["shingle_r"])
            & (left["a"] < right["b"]),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    la = sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("n_a"))
    lb = sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("n_b"))
    union_sz = F.col("n_a") + F.col("n_b") - F.col("n_common")
    jacc = stable_round(F.col("n_common") / F.greatest(union_sz, F.lit(1)), 4)
    return (
        common.join(la, "a")
        .join(lb, "b")
        .select("a", "b", jacc.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def build_bloom(
    df: DataFrame,
    key: Column | str,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> list[int]:
    """Build a Bloom filter over a key column as ``m_bits // 64`` longs.

    The membership sketch for incremental corpus dedup: admit a new batch
    against an EXISTING 100 TB corpus without joining it — the corpus is
    represented by m_bits of filter state (8 KB here; a few GB covers
    billions of keys at 1% FP), built in one linear pass and probed as
    pure expression arithmetic on the batch side. False positives only (a
    hit must still be verified, or accepted as over-dropping); NEVER
    false negatives — a miss is definitely new, which is the guarantee
    admission control needs.

    Build shape: k hash positions per key (xxhash64 seeded by slot) →
    explode → DISTINCT positions (≤ m_bits rows however large the corpus
    — the shuffle is bounded by the filter size, not the data) →
    driver sets bits in the dense word array. The collect is bounded by
    m_bits — the same bounded-driver-state pattern as mixture_sample.
    m_bits must be a power of two."""
    if m_bits & (m_bits - 1):
        raise ValueError("m_bits must be a power of two")
    c = F.col(key) if isinstance(key, str) else key
    pos = [
        F.pmod(F.xxhash64(c, F.lit(i)), F.lit(m_bits)).cast("long") for i in range(k)
    ]
    rows = (
        df.select(F.explode(F.array(*pos)).alias("p")).distinct().collect()
    )
    dense = [0] * (m_bits // 64)
    for r in rows:
        p_ = int(r["p"])
        dense[p_ >> 6] |= 1 << (p_ & 63)
    # two's-complement so every word fits Spark's signed LongType literal
    # (bit 63 set would otherwise overflow); getbit reads the same bits.
    return [w - (1 << 64) if w >= (1 << 63) else w for w in dense]


def bloom_might_contain(
    key: Column | str,
    bloom: list[int],
    k: int = 4,
) -> Column:
    """Probe expression for a filter built by build_bloom: TRUE iff every
    one of the key's k bits is set. Pure JVM arithmetic — element_at into
    the literal word array + getbit — so the probe side is a narrow map
    over the new batch; it never shuffles and never touches the original
    corpus."""
    m_bits = len(bloom) * 64
    c = F.col(key) if isinstance(key, str) else key
    # One-leaf literal (relational.int_lit_array): the dense word array
    # folds to a single array Literal instead of a 1024-child CreateArray.
    arr = int_lit_array(bloom)
    cond = F.lit(True)
    for i in range(k):
        pos = F.pmod(F.xxhash64(c, F.lit(i)), F.lit(m_bits)).cast("long")
        word = F.element_at(arr, F.shiftright(pos, 6).cast("int") + 1)
        bit = F.getbit(word, pos % 64)
        cond = cond & (bit == 1)
    return cond


def substr_decontaminate(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    stride: int = 10,
) -> DataFrame:
    """Cross-split EXACT-SUBSTRING decontamination: flag training
    documents sharing any verbatim ``window``-token span with the
    evaluation set — the n-gram-overlap screen (GPT-3 appendix C /
    PaLM style) that catches benchmark text pasted inside otherwise
    novel documents, which whole-doc and near-dup decontamination miss.
    Complements ext_decontaminate (cross-split Jaccard): Jaccard finds
    mostly-similar docs; this finds verbatim fragments.

    Shape: the TEST side collapses to its DISTINCT span fingerprints —
    eval sets are small, so this side broadcasts; the train side is the
    same linear fingerprint pass span_dup_report uses, LEFT-joined to
    the broadcast and aggregated per doc. The 100 TB train corpus is
    never shuffled. Output (contaminated docs only — change-sized):
    (id, n_spans, n_contaminated_spans, contam_frac)."""
    tr = span_fingerprints(train, text_col, id_col, window, stride)
    te = (
        span_fingerprints(test, text_col, id_col, window, stride)
        .select("span_md5")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    marked = tr.join(F.broadcast(te), "span_md5", "left")
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_contaminated_spans"),
        )
        .where(F.col("n_contaminated_spans") > 0)
        .withColumn(
            "contam_frac",
            stable_round(
                F.col("n_contaminated_spans") / F.col("n_spans").cast("double"), 4
            ),
        )
    )


def build_count_min(
    df: DataFrame,
    key: Column | str,
    width: int = 4096,
    depth: int = 4,
    hash_expr=None,
) -> list[list[int]]:
    """Build a Count-Min sketch over a key column: ``depth`` rows of
    ``width`` counters (Cormode & Muthukrishnan 2005). The frequency
    companion of build_bloom: per-key OCCURRENCE-count estimates for an
    unbounded key universe in depth×width integers of state — "how often
    does this URL/user/shingle appear in the 100 TB corpus" answerable
    from kilobytes, never underestimating (every counter a key hashes to
    counts at least all its occurrences).

    Build shape: explode each row to its depth (row, position) cells,
    ONE sum aggregate over ≤ depth·width groups (bounded by sketch size,
    not data), driver packs the dense table — the same bounded-collect
    pattern as build_bloom. Counter updates are associative sums, so
    per-partition partials combine map-side and sketches of disjoint
    batches could be merged by elementwise addition.

    ``hash_expr`` (optional) overrides the row hash: a callable
    ``(key_col, j) -> Column`` returning the row-``j`` counter position
    in ``[0, width)``. Default is xxhash64 (fastest, JVM-native); pass
    :func:`cm_md5_hash`'s maker for a hash any ANSI engine replays
    bit-for-bit (the exact-replay oracle pattern)."""
    c = F.col(key) if isinstance(key, str) else key
    if hash_expr is None:
        hash_expr = lambda col, j: F.pmod(  # noqa: E731
            F.xxhash64(col, F.lit(1000 + j)), F.lit(width)
        ).cast("int")
    cells = [
        F.struct(
            F.lit(j).alias("row"),
            hash_expr(c, j).cast("int").alias("pos"),
        )
        for j in range(depth)
    ]
    rows = (
        df.select(F.explode(F.array(*cells)).alias("s"))
        .groupBy(F.col("s.row").alias("row"), F.col("s.pos").alias("pos"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    table = [[0] * width for _ in range(depth)]
    for r in rows:
        table[r["row"]][r["pos"]] = r["n"]
    return table


def cm_estimate(key: Column | str, table: list[list[int]], hash_expr=None) -> Column:
    """Point-estimate expression for a Count-Min sketch built by
    build_count_min: min over the depth counters the key hashes to.
    Pure JVM arithmetic against the literal counter table — a narrow
    map, no shuffle, no join. ``hash_expr`` must match the build's."""
    depth, width = len(table), len(table[0])
    c = F.col(key) if isinstance(key, str) else key
    if hash_expr is None:
        hash_expr = lambda col, j: F.pmod(  # noqa: E731
            F.xxhash64(col, F.lit(1000 + j)), F.lit(width)
        ).cast("int")
    # depth*width counters as ONE literal leaf: at the 4x4096 default this
    # was a 16,384-child CreateArray costing ~10 s of driver-side build and
    # analysis time per query build (guide §1.2); int_lit_array keeps the
    # executed literal (and its element width) identical.
    flat = int_lit_array([v for row in table for v in row])
    ests = []
    for j in range(depth):
        pos = hash_expr(c, j).cast("int")
        ests.append(F.element_at(flat, F.lit(j * width) + pos + 1))
    return F.least(*ests)


def cm_md5_hash(width: int):
    """An ANSI-replayable Count-Min row hash for build_count_min /
    cm_estimate's ``hash_expr``: position = md5(key || '|' || j) first
    15 hex chars as an integer, mod width — computable bit-for-bit in
    any engine with MD5 + string concat (DuckDB:
    ``('0x'||SUBSTR(MD5(key::VARCHAR||'|'||j),1,15))::BIGINT % width``),
    which is what lets an exact-replay oracle rebuild the full counter
    table and every per-key estimate instead of checking an error
    envelope. 15 hex chars keep the value inside int64 both engines."""

    def h(col: Column, j: int) -> Column:
        hx = F.md5(F.concat(col.cast("string"), F.lit(f"|{j}")))
        return F.pmod(F.conv(F.substring(hx, 1, 15), 16, 10).cast("long"), F.lit(width))

    return h


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    window: int = 4,
    tokens_col: str | None = None,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS local fingerprinting algorithm): hash the
    POSITIONAL word n-gram sequence, slide a ``window``-hash window, and
    select each window's minimum. Winnowing guarantees any shared run of
    ``window + ngram - 1`` tokens yields at least one shared selected
    fingerprint (the local-containment property k-gram sampling lacks),
    while keeping ~2/(window+1) of the hashes.

    The tie rule: classic winnowing picks the RIGHTMOST minimal hash to
    minimize fingerprint count, but ties have EQUAL HASH VALUES, so the
    selected value-set — all this operator emits — is tie-rule-invariant
    (positions are not emitted precisely to keep that invariance).

    Hashes are md5-derived 32-bit ints (not xxhash64) so any ANSI engine
    replays them bit-for-bit. Everything is per-row array built-ins —
    one narrow projection, no shuffle, no Python; docs with fewer than
    ``ngram`` tokens emit no fingerprints and drop out.

    Output: (id, fps array<long> DISTINCT selected hashes, n_fps).
    """
    if tokens_col is not None:  # pre-tokenized, pre-spread input (see shingle_sets)
        grams = word_ngrams(F.col(tokens_col), ngram)
    else:
        grams = word_ngrams(tokens(text_col), ngram)
    hs = F.transform(
        grams, lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
    )
    spread = df if tokens_col is not None else fan_out(df.select(id_col, text_col))
    base = spread.select(
        F.col(id_col), hs.alias("__hs")
    ).where(F.size("__hs") > 0)
    n_win = F.greatest(F.size("__hs") - F.lit(window - 1), F.lit(1))
    sel = F.array_sort(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_win),
                lambda i: F.array_min(F.slice(F.col("__hs"), i, window)),
            )
        )
    )
    return base.select(
        F.col(id_col), sel.alias("fps"), F.size(sel).alias("n_fps")
    )


def winnowing_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    window: int = 4,
    min_shared: int = 2,
    df_cap: int = 50,
    tokens_col: str | None = None,
) -> DataFrame:
    """Cross-document copy detection over winnowing fingerprints: pairs
    of documents sharing >= ``min_shared`` selected fingerprints — the
    MOSS similarity join. Inverted-index shape (explode -> equi-join on
    the fingerprint -> pair count), so cost is sum(df_fp^2) over
    fingerprint buckets, never corpus-quadratic; ``df_cap`` drops
    fingerprints appearing in more than that many documents (boilerplate
    hashes — the classic stop-fingerprint rule) which BOUNDS per-bucket
    fan-out at scale. The document-frequency count is a window over the
    same fingerprint partitioning the join shuffles on.

    Output: (a, b, n_shared) with a < b.
    """
    from pyspark.sql import Window

    fps = winnowing_fingerprints(df, text_col, id_col, ngram, window, tokens_col)
    ex = fps.select(F.col(id_col), F.explode("fps").alias("fp"))
    ex = (
        ex.withColumn("__df", F.count(F.lit(1)).over(Window.partitionBy("fp")))
        .where(F.col("__df") <= df_cap)
        .drop("__df")
    )
    left = ex.select(F.col("fp"), F.col(id_col).alias("a"))
    right = ex.select(F.col("fp").alias("fp_r"), F.col(id_col).alias("b"))
    return (
        left.join(right, (left["fp"] == right["fp_r"]) & (left["a"] < right["b"]))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def pair_bleu(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    round_digits: int = 4,
) -> DataFrame:
    """BLEU-2 audit of the verified near-duplicate pairs (Papineni et
    al. 2002): for each (a, b) pair the ORDER-SENSITIVE counterpart of
    Jaccard — modified (clipped) unigram/bigram precision of the later
    document against the earlier one, brevity penalty, and their
    geometric mean. Jaccard sees bags of shingles; BLEU-2's bigram term
    distinguishes shuffled-sentence rewrites from verbatim copies, which
    is the triage signal a dedup pipeline uses to pick "drop vs keep
    both" on borderline pairs.

    Scale shape: pairs come from the linear LSH pipeline; the corpus is
    semi-join-pruned to pair members (broadcastable by construction)
    before any tokenization, and each pair's clipped counts are per-row
    array folds — no shuffle beyond the pair join. Counts are integers;
    the only floats are two divisions, sqrt, and the brevity exp —
    rounded for output in both engines.

    Output: (a, b, p1, p2, bp, bleu2) — candidate = b, reference = a.
    """
    pairs = (
        verified_near_duplicates(df, text_col, id_col, threshold)
        .select("a", "b")
        .localCheckpoint(eager=False)
    )
    ids = pairs.select(F.explode(F.array("a", "b")).alias(id_col)).distinct()
    cand = fan_out(
        df.join(F.broadcast(ids), id_col, "left_semi").select(id_col, text_col)
    ).select(F.col(id_col), tokens(text_col).alias("tk"))
    j = (
        F.broadcast(pairs)
        .join(cand.select(F.col(id_col).alias("a"), F.col("tk").alias("ta")), "a")
        .join(cand.select(F.col(id_col).alias("b"), F.col("tk").alias("tb")), "b")
    )

    def clipped(cg: Column, rg: Column) -> Column:
        return F.aggregate(
            F.transform(
                F.array_distinct(cg),
                lambda g: F.least(
                    F.size(F.filter(cg, lambda x: x == g)),
                    F.size(F.filter(rg, lambda x: x == g)),
                ),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )

    c1, r1 = F.col("tb"), F.col("ta")
    c2, r2 = word_ngrams(F.col("tb"), 2), word_ngrams(F.col("ta"), 2)
    p1 = clipped(c1, r1).cast("double") / F.size(c1).cast("double")
    p2 = clipped(c2, r2).cast("double") / F.size(c2).cast("double")
    lc, lr = F.size("tb").cast("double"), F.size("ta").cast("double")
    bp = F.when(lc < lr, F.exp(F.lit(1.0) - lr / lc)).otherwise(F.lit(1.0))
    return j.select(
        "a",
        "b",
        stable_round(p1, round_digits).alias("p1"),
        stable_round(p2, round_digits).alias("p2"),
        stable_round(bp, round_digits).alias("bp"),
        stable_round(bp * F.sqrt(p1 * p2), round_digits).alias("bleu2"),
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int = 1000,
    tokens_col: str | None = None,
) -> DataFrame:
    """ASYMMETRIC near-dup pairs by shingle CONTAINMENT — the signal
    Jaccard structurally misses: a short document quoted whole inside a
    long one has |A∩B|/|A| ≈ 1 but Jaccard |A∩B|/|A∪B| ≈ |A|/|B| ≈ 0,
    so inclusion-dedup (Broder's containment, the quote/boilerplate-
    embedding case) needs max(C(A,B), C(B,A)) = shared / min(|A|, |B|).

    Same inverted-index + df-cap shape as jaccard_pairs (one shuffle
    keyed by shingle, one by pair; stop-shingle cap bounds the k²
    bucket fan-out); only pairs sharing a shingle materialize, which is
    exact for any threshold > 0.

    Output: (a, b, containment, jaccard) for max-containment >=
    ``threshold``, a < b — jaccard included so callers can see exactly
    the pairs containment catches and Jaccard would not.
    """
    from pyspark.sql import Window

    if tokens_col is not None:  # pre-tokenized, pre-spread input (see shingle_sets)
        base, grams = df, word_ngrams(F.col(tokens_col), ngram)
    else:
        base, grams = fan_out(df.select(id_col, text_col)), word_ngrams(tokens(text_col), ngram)
    shingled = base.select(
        F.col(id_col),
        F.explode(F.array_distinct(grams)).alias("shingle"),
    )
    w_df = Window.partitionBy("shingle")
    shingled = (
        shingled.withColumn("__df", F.count(F.lit(1)).over(w_df))
        .where(F.col("__df") <= max_shingle_df)
        .drop("__df")
    )
    sizes = shingled.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    left = shingled.select(F.col("shingle"), F.col(id_col).alias("a"))
    right = shingled.select(F.col("shingle").alias("shingle_r"), F.col(id_col).alias("b"))
    common = (
        left.join(
            right,
            (left["shingle"] == right["shingle_r"]) & (left["a"] < right["b"]),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    la = sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("n_a"))
    lb = sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("n_b"))
    cont = stable_round(
        F.col("n_common") / F.greatest(F.least(F.col("n_a"), F.col("n_b")), F.lit(1)), 4
    )
    union_sz = F.col("n_a") + F.col("n_b") - F.col("n_common")
    jacc = stable_round(F.col("n_common") / F.greatest(union_sz, F.lit(1)), 4)
    return (
        common.join(la, "a")
        .join(lb, "b")
        .select("a", "b", cont.alias("containment"), jacc.alias("jaccard"))
        .where(F.col("containment") >= threshold)
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_term_df: int = 1000,
    tokens_col: str | None = None,
) -> DataFrame:
    """WEIGHTED lexical near-dup pairs: TF-IDF cosine similarity through
    the term inverted index — the third lexical similarity modality
    (Jaccard sees shingle SETS, containment sees inclusion; TF-IDF
    cosine weighs repeated rare terms, so topic-duplicates with
    different boilerplate score high while stopword-heavy overlap does
    not). idf = ln(N/df) over whitespace tokens.

    Shape: explode terms → per-(doc, term) counts → self-join keyed by
    term (the inverted index; ``max_term_df`` stop-term cap bounds the
    k² bucket fan-out) → one pair aggregate. Exactness: each pair's dot
    product sums per-term tf_a·idf²·tf_b PRODUCTS QUANTIZED to integers
    (floor(x·10⁶ + 0.5) — BIGINT, associative, partition-order-free),
    and each doc's norm² sums quantized tf²·idf² the same way, so the
    only floats in the output are two sqrts and one division on exact
    integers.

    Output: (a, b, cosine) for pairs >= threshold, a < b.
    """
    from pyspark.sql import Window

    if tokens_col is not None:  # pre-tokenized, pre-spread input (see shingle_sets)
        base, toks = df, F.col(tokens_col)
    else:
        base, toks = fan_out(df.select(id_col, text_col)), tokens(text_col)
    tf = (
        base.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w_df = Window.partitionBy("term")
    tf = tf.withColumn("__df", F.count(F.lit(1)).over(w_df)).where(
        F.col("__df") <= max_term_df
    )
    n_docs = df.select(F.countDistinct(id_col).alias("n"))
    weighted = tf.crossJoin(F.broadcast(n_docs)).select(
        F.col(id_col),
        "term",
        F.col("tf"),
        F.log(F.col("n").cast("double") / F.col("__df")).alias("idf"),
    )
    q = lambda x: F.floor(x * F.lit(1.0e6) + F.lit(0.5)).cast("long")  # noqa: E731
    norms = weighted.groupBy(id_col).agg(
        F.sum(q(F.col("tf") * F.col("tf") * F.col("idf") * F.col("idf"))).alias("qn2")
    )
    left = weighted.select("term", F.col(id_col).alias("a"), F.col("tf").alias("tfa"), "idf")
    right = weighted.select(
        F.col("term").alias("term_r"), F.col(id_col).alias("b"), F.col("tf").alias("tfb")
    )
    dots = (
        left.join(right, (left["term"] == right["term_r"]) & (left["a"] < right["b"]))
        .groupBy("a", "b")
        .agg(F.sum(q(F.col("tfa") * F.col("idf") * F.col("idf") * F.col("tfb"))).alias("qdot"))
    )
    na = norms.select(F.col(id_col).alias("a"), F.col("qn2").alias("qa"))
    nb = norms.select(F.col(id_col).alias("b"), F.col("qn2").alias("qb"))
    cos = stable_round(
        F.col("qdot").cast("double")
        / (F.sqrt(F.col("qa").cast("double")) * F.sqrt(F.col("qb").cast("double"))),
        4,
    )
    return (
        dots.join(na, "a")
        .join(nb, "b")
        .select("a", "b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
