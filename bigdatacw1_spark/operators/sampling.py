"""Deterministic sampling operators (north-star extension, SURVEY.md §2.11).

Training-data pipelines need samples that are REPRODUCIBLE (same rows on
every run, on any cluster size) and JOIN-STABLE (a key lands on the same
side of a split in every table that carries it). Random `df.sample()`
gives neither. These operators derive the sampling decision from a
content hash of the key instead:

    bucket(key) = int(first 8 hex chars of md5(key || salt)) mod B

so membership is a pure per-row predicate — no shuffle, no state, no
driver round-trip — and pushes down past column pruning like any other
filter. At 100 TB this is the only sampling strategy that works: the
sample of a table is computable partition-locally, and two tables
sampled on the same key agree exactly, so you can sample-then-join.

md5 (not xxhash64/crc32) because it is bit-identical across engines —
the DuckDB oracle expresses the same bucket as
``('0x' || substr(md5(key || salt), 1, 8))::BIGINT % B`` — and across
Spark versions; its cost is irrelevant next to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bucket count giving ~1e-6 fraction granularity; 2^32 hash values
#: spread over 1e6 buckets keeps per-bucket quantization error < 0.025%.
DEFAULT_BUCKETS = 1_000_000


def md5_bucket(key: Column | str, n_buckets: int = DEFAULT_BUCKETS, salt: str = "") -> Column:
    """Uniform deterministic bucket in [0, n_buckets) from md5(key||salt).

    The first 8 hex chars are a uniform 32-bit value; `conv` parses them
    big-endian exactly like the oracle's ``('0x'||…)::BIGINT`` cast.
    Changing ``salt`` re-draws the assignment (a fresh "seed") without
    touching the data.
    """
    key = F.col(key) if isinstance(key, str) else key
    hex8 = F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8)
    return F.conv(hex8, 16, 10).cast("bigint") % F.lit(n_buckets)


def hash_sample(
    df: DataFrame,
    key: Column | str,
    fraction: float,
    salt: str = "",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows, decided per key.

    Rows whose bucket falls below ``fraction * n_buckets`` are kept, so
    samples at growing fractions are NESTED (the 1% sample is a subset of
    the 10% sample) — handy for scaling-law runs on the same corpus.
    """
    return df.where(md5_bucket(key, n_buckets, salt) < F.lit(int(fraction * n_buckets)))


def stratified_hash_sample(
    df: DataFrame,
    key: Column | str,
    strata: Column | str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages, keep all of rare ones). ``fractions`` maps stratum value →
    keep fraction; unlisted strata get ``default_fraction``.

    The threshold is a broadcast-free CASE expression — still a pure
    per-row predicate, still partition-local at any scale.
    """
    strata = F.col(strata) if isinstance(strata, str) else strata
    threshold: Column = F.lit(int(default_fraction * n_buckets))
    for value, frac in sorted(fractions.items()):
        threshold = F.when(strata == value, F.lit(int(frac * n_buckets))).otherwise(threshold)
    return df.where(md5_bucket(key, n_buckets, salt) < threshold)


def train_test_split(
    df: DataFrame,
    key: Column | str,
    test_fraction: float = 0.1,
    salt: str = "split",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Tag every row 'train' or 'test' by key hash — the split survives
    re-runs, repartitioning, and joins against other tables keyed the
    same way (no leakage from a document landing on both sides)."""
    is_test = md5_bucket(key, n_buckets, salt) < F.lit(int(test_fraction * n_buckets))
    return df.withColumn("split", F.when(is_test, F.lit("test")).otherwise(F.lit("train")))


def hash_sample_n(
    df: DataFrame,
    key: Column | str,
    n: int,
    salt: str = "",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Deterministic fixed-SIZE sample: the n rows with the smallest
    (bucket, key) hash rank — rendezvous/bottom-k sampling.

    Unlike ``hash_sample`` (fixed fraction) this needs a top-k, not a
    full sort: Spark plans the limit as TakeOrderedAndProject (per-
    partition heap + merge of n-row partials), so no global sort and no
    count pass happen at any scale. Uniform because the hash is; ties
    broken by the key itself so the result is a function of the data
    only."""
    key = F.col(key) if isinstance(key, str) else key
    return (
        df.withColumn("__rank", md5_bucket(key, n_buckets, salt))
        .orderBy(F.col("__rank"), key)
        .limit(n)
        .drop("__rank")
    )


def mixture_sample(
    df: DataFrame,
    key: Column | str,
    domain: str,
    weights: dict[str, int],
    salt: str = "mix",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Domain-mixture sampling: downsample each ``domain`` stratum so the
    OUTPUT approximates the target mixture ``weights`` (integer parts,
    e.g. ``{"web": 7, "books": 2, "code": 1}``) — the corpus-mixing step
    of training-data assembly, without replacement (never upsamples).

    Math, all in BIGINT so the thresholds are bit-identical in any
    engine: with W = Σw and per-domain counts n_d, the largest feasible
    output T satisfies T·w_d/W ≤ n_d for every weighted domain, so
    T = min_d ⌊n_d·W / w_d⌋; the per-domain take is m_d = ⌊T·w_d / W⌋
    and the keep predicate is ``md5_bucket(key) < ⌊B·m_d / n_d⌋``.
    The binding (scarcest-relative-to-weight) domain is kept whole; all
    others are hash-downsampled to match, to bucket granularity.

    The per-domain counts are a tiny aggregate collected to the driver
    to derive the global scalar thresholds — the same pattern as
    histogram bounds; the data-sized pass stays a pure partition-local
    predicate, so at 100 TB the cost is one map-side-combined count plus
    a filtered scan. The collect is BOUNDED BY THE CALLER, not the data:
    rows are pre-filtered to the weighted domains, so at most
    ``len(weights)`` rows ever reach the driver no matter how many
    distinct domain values the corpus holds. Domains absent from
    ``weights`` (or with weight 0) are dropped; weighted domains absent
    from the data are ignored (the mixture renormalizes over the
    domains that exist).
    """
    if any(w < 0 for w in weights.values()):
        raise ValueError("mixture weights must be non-negative integers")
    active = {d: w for d, w in weights.items() if w > 0}
    if not active:
        return df.where(F.lit(False))
    counts = {
        r[0]: r[1]
        for r in df.where(F.col(domain).isin(list(active)))
        .groupBy(domain)
        .agg(F.count(F.lit(1)))
        .collect()
    }
    if not counts:
        return df.where(F.lit(False))
    total_w = sum(active[d] for d in counts)
    t_max = min(counts[d] * total_w // active[d] for d in counts)
    thresholds = {
        d: n_buckets * (t_max * active[d] // total_w) // counts[d] for d in counts
    }
    thr: Column = F.lit(-1)
    for d in sorted(thresholds):
        thr = F.when(F.col(domain) == d, F.lit(thresholds[d])).otherwise(thr)
    return df.where(md5_bucket(key, n_buckets, salt) < thr)


def weighted_sample_n(
    df: DataFrame,
    key: Column | str,
    weight: Column | str,
    n: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sample of n rows WITHOUT replacement via
    priority sampling (Duffield, Lund & Thorup, JACM 2007): each row gets
    priority ``w / u`` with u a deterministic hash-uniform in (0,1), and
    the n highest priorities win — inclusion probability is ~proportional
    to weight, repeatable across runs/engines because u comes from
    md5(key||salt), not an RNG.

    Chosen over the classic A-ES key ``u^(1/w)`` deliberately: that needs
    ln/exp, whose last-ulp results differ across math libraries, while
    ``w / u`` is a single IEEE division — bit-identical in any engine, so
    the exact selected row set is oracle-checkable. Same TakeOrdered
    shape as hash_sample_n: per-partition top-n heaps, no global sort.

    Zero/negative weights get priority <= 0 and effectively never win.
    Appends a ``priority`` column (double).
    """
    key = F.col(key) if isinstance(key, str) else key
    weight = F.col(weight) if isinstance(weight, str) else weight
    hex8 = F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8)
    u = (F.conv(hex8, 16, 10).cast("long") + F.lit(0.5)) / F.lit(4294967296.0)
    pr = weight.cast("double") / u
    return df.withColumn("priority", pr).orderBy(F.desc("priority"), key).limit(n)


def dsir_scores(
    docs: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
    round_digits: int = 4,
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.,
    NeurIPS 2023): score every raw document by how target-like it is
    under two bag-of-HASHED-unigrams language models, one fit on the
    target subset (rows where ``target_pred``), one on the whole corpus:

        score(d) = Σ_tokens ln p_target(bucket(tok)) − ln p_raw(bucket(tok))
                 = Σ_buckets count_d(b) · lr(b)

    with add-1-smoothed bucket probabilities. High scores = documents
    the target model finds likelier — DSIR selects those to up-weight a
    domain without a trained classifier.

    Scale shape: the expensive pass is ONE tokenize+explode over the
    corpus, reduced immediately to per-(doc, bucket) counts and
    localCheckpoint'd — every downstream statistic (per-bucket raw and
    target counts via one conditional-sum aggregate, the per-doc score
    join) reads that materialized ≤16-rows-per-doc projection, so the
    corpus is tokenized exactly once (ADVICE r4: the previous shape
    re-tokenized per aggregate). The model itself is ``n_buckets``
    rows — broadcast back onto the per-doc counts, so the fact side
    never reshuffles. Hashing is md5 (engine-portable, see md5_bucket);
    the per-doc float sum folds over the SORTED bucket list (≤ n_buckets
    elements) so summation order is engine-identical, and the single
    division + two ln calls per bucket mirror the oracle expression
    shape exactly (lm_surprisal discipline).

    Output: (id_col, dsir_score) for documents with ≥1 token.
    """
    from bigdatacw1_spark.operators.relational import stable_round
    from bigdatacw1_spark.functions.text import tokens

    tok = docs.select(
        F.col(id_col),
        target_pred.alias("__is_target"),
        F.explode(tokens(F.col(text_col))).alias("__w"),
    ).withColumn("__b", md5_bucket(F.col("__w"), n_buckets))

    # The ONLY pass over the exploded tokens: reduce to per-(doc, bucket)
    # counts (__is_target is doc-constant so it rides the key for free)
    # and materialize, so model fitting and scoring below never
    # re-tokenize the corpus.
    doc_counts = (
        tok.groupBy(id_col, "__is_target", "__b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    bucket_counts = doc_counts.groupBy("__b").agg(
        F.sum("cnt").alias("nr"),
        F.sum(F.when(F.col("__is_target"), F.col("cnt")).otherwise(F.lit(0))).alias("nt"),
    )
    spark = docs.sparkSession
    grid = spark.range(n_buckets).select(F.col("id").alias("__b"))
    model = (
        grid.join(bucket_counts, "__b", "left")
        .select(
            "__b",
            F.coalesce(F.col("nr"), F.lit(0)).alias("nr"),
            F.coalesce(F.col("nt"), F.lit(0)).alias("nt"),
        )
    )
    # denominators: corpus-wide token totals (computed once, broadcast with
    # the model rows via a cross-joinable 1-row aggregate)
    totals = model.agg(
        F.sum("nr").alias("xr"), F.sum("nt").alias("xt")
    )
    lr = model.crossJoin(F.broadcast(totals)).select(
        "__b",
        (
            F.log((F.col("nt") + F.lit(1.0)) / (F.col("xt") + F.lit(float(n_buckets))))
            - F.log((F.col("nr") + F.lit(1.0)) / (F.col("xr") + F.lit(float(n_buckets))))
        ).alias("lr"),
    )

    terms = doc_counts.join(F.broadcast(lr), "__b").select(
        id_col, "__b", (F.col("cnt") * F.col("lr")).alias("term")
    )
    folded = (
        terms.groupBy(id_col)
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__b", "term"))),
                    lambda s: s["term"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("__score")
        )
    )
    return folded.select(
        id_col, stable_round(F.col("__score"), round_digits).alias("dsir_score")
    )


def _logreg_features(
    docs: DataFrame,
    label_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    chars_col: str = "n_chars",
) -> DataFrame:
    """(id, x1, x2, y) feature frame shared by logreg_quality_scores and
    el2n_difficulty — localCheckpoint'd so the projection computes once
    across the GD rounds and the final scoring pass."""
    from bigdatacw1_spark.functions.text import tokens

    return docs.select(
        F.col(id_col),
        (F.least(F.col(chars_col), F.lit(512)).cast("double") / F.lit(512.0)).alias("x1"),
        (F.least(F.size(tokens(text_col)), F.lit(100)).cast("double") / F.lit(100.0)).alias(
            "x2"
        ),
        F.when(label_pred, F.lit(1.0)).otherwise(F.lit(0.0)).alias("y"),
    ).localCheckpoint(eager=False)


def _logreg_sigmoid(w0: float, w1: float, w2: float) -> Column:
    z = (F.lit(w0) + F.lit(w1) * F.col("x1")) + F.lit(w2) * F.col("x2")
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_fit(feat: DataFrame, iters: int = 3, lr: float = 0.5) -> tuple[float, float, float]:
    """Full-batch GD on the (x1, x2, y) feature frame; every round is ONE
    distributed aggregate of integer-quantized gradient terms (exact,
    associative, partition-order-free — see logreg_quality_scores).
    Returns the trained (w0, w1, w2)."""
    w0, w1, w2 = 0.0, 0.0, 0.0
    for _ in range(iters):
        g = _logreg_sigmoid(w0, w1, w2) - F.col("y")

        def _q(term: Column) -> Column:
            return F.floor(term * F.lit(1.0e9) + F.lit(0.5)).cast("decimal(38,0)")

        row = feat.agg(
            F.sum(_q(g)).alias("s0"),
            F.sum(_q(g * F.col("x1"))).alias("s1"),
            F.sum(_q(g * F.col("x2"))).alias("s2"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        n = row["n"]
        if not n:
            raise ValueError("logreg_fit: empty input")
        w0 = w0 - lr * ((float(row["s0"]) / n) / 1.0e9)
        w1 = w1 - lr * ((float(row["s1"]) / n) / 1.0e9)
        w2 = w2 - lr * ((float(row["s2"]) / n) / 1.0e9)
    return w0, w1, w2


def logreg_quality_scores(
    docs: DataFrame,
    label_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    chars_col: str = "n_chars",
    iters: int = 3,
    lr: float = 0.5,
    round_digits: int = 4,
) -> DataFrame:
    """TRAINED quality filter (the GPT-3 / LLaMA recipe, Brown et al. 2020
    appendix A): fit a logistic-regression classifier that separates a
    "high-quality" subset (``label_pred``) from the rest of the corpus,
    then score EVERY document with P(high-quality) — the learned
    complement to the heuristic gates (token_quality_score, Gopher/C4
    rules), which is how production crawls are actually filtered.

    Training is full-batch gradient descent, and every iteration is ONE
    distributed aggregate (partial sums combine map-side; the driver
    sees 4 scalars per round — a model-sized collect, never data-sized):

        g_j = Σ_docs (σ(w·x) − y) · x_j      w ← w − lr · g/n

    Cross-engine determinism (the DuckDB oracle replays every round as a
    chained CTE): each document's gradient term is quantized to an
    integer (floor(g·1e9 + 0.5) — the stable_round discipline), so the
    per-round sum is an EXACT integer, associative and
    partition-order-free; the weight update divides that one integer the
    same way in both engines. σ uses a single EXP on bit-identical
    inputs (the features are ratios of integers; the dot product folds
    in fixed order w0 + w1·x1 + w2·x2). Summing quantized doubles
    instead would tie the result to Spark's partition order.

    Scale: 3 passes over (id, x1, x2, y) — localCheckpoint'd so the
    feature projection computes once. Sums are DECIMAL(38,0) (2^63
    overflows around 1e10 docs × 1e9 scale; 38 digits does not).

    Output: (doc_id, y, p_hq, keep) — the score every selection step
    downstream (hash_sample on kept rows, token_budget_mix, …) consumes.
    """
    from bigdatacw1_spark.operators.relational import stable_round

    feat = _logreg_features(docs, label_pred, text_col, id_col, chars_col)
    w0, w1, w2 = logreg_fit(feat, iters, lr)
    p = _logreg_sigmoid(w0, w1, w2)
    return feat.select(
        F.col(id_col),
        F.col("y").cast("int").alias("y"),
        stable_round(p, round_digits).alias("p_hq"),
        (p >= F.lit(0.5)).alias("keep"),
    )


def binary_classifier_eval(
    scores: DataFrame,
    score_col: str = "p_hq",
    label_col: str = "y",
    threshold: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """Exact evaluation of a binary scorer against 0/1 labels: the
    confusion counts + precision/recall/F1 at ``threshold`` and the
    tie-adjusted ROC AUC (Mann-Whitney with average ranks) — the
    metrics a trained quality filter (logreg_quality_scores) is accepted
    or rejected on.

    Scale shape: ONE hash aggregate groups the corpus down to the
    distinct (score, label) pairs — ``score_col`` is a ROUNDED
    probability, so that table is bounded by construction (<= 2·10^d + 2
    rows for d-digit scores) — and the rank cumulation runs as a window
    over THAT bounded frame, never over the corpus (the corpus-sized
    pass is the one hash aggregate; cf. the test_plans allowlist).

    Exactness: with per-score tie groups of size n and cum docs-before
    c, the positives' doubled rank-sum is Σ np·(2c + n + 1) — integers
    end to end (DECIMAL(38,0): n² rank-sums overflow BIGINT around 3e9
    docs), with ONE final division per metric. AUC uses the textbook
    identity auc = (R_pos − n_pos(n_pos+1)/2) / (n_pos·n_neg).

    Output: one row (n_pos, n_neg, tp, fp, fn, tn, precision, recall,
    f1, auc).
    """
    from pyspark.sql import Window

    from bigdatacw1_spark.operators.relational import stable_round

    dec = "decimal(38,0)"
    g = scores.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(label_col).cast(dec).alias("np"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.withColumn("cumn", F.sum("n").over(w))
    pos_pred = F.col("s") >= F.lit(threshold)
    agg = cum.agg(
        F.sum("np").alias("n_pos"),
        F.sum(F.col("n") - F.col("np")).alias("n_neg"),
        F.sum(
            F.col("np") * (F.lit(2) * (F.col("cumn") - F.col("n")) + F.col("n") + F.lit(1))
        ).alias("two_rpos"),
        F.sum(F.when(pos_pred, F.col("np")).otherwise(F.lit(0).cast(dec))).alias("tp"),
        F.sum(
            F.when(pos_pred, F.col("n") - F.col("np")).otherwise(F.lit(0).cast(dec))
        ).alias("fp"),
    )
    tp, fp = F.col("tp"), F.col("fp")
    fn = F.col("n_pos") - tp
    tn = F.col("n_neg") - fp
    auc = (
        F.col("two_rpos").cast("double")
        - F.col("n_pos").cast("double") * (F.col("n_pos") + F.lit(1)).cast("double")
    ) / (F.lit(2.0) * F.col("n_pos").cast("double") * F.col("n_neg").cast("double"))
    return agg.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        tn.cast("long").alias("tn"),
        stable_round(tp.cast("double") / (tp + fp).cast("double"), round_digits).alias(
            "precision"
        ),
        stable_round(tp.cast("double") / F.col("n_pos").cast("double"), round_digits).alias(
            "recall"
        ),
        stable_round(
            F.lit(2.0) * tp.cast("double") / (F.lit(2) * tp + fp + fn).cast("double"),
            round_digits,
        ).alias("f1"),
        stable_round(auc, round_digits).alias("auc"),
    )


def el2n_difficulty(
    docs: DataFrame,
    label_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    chars_col: str = "n_chars",
    iters: int = 10,
    lr: float = 2.0,
    round_digits: int = 6,
) -> DataFrame:
    """Example-difficulty scores for data pruning (EL2N, Paul et al.
    NeurIPS 2021 "Deep Learning on a Data Diet"): train the logistic
    quality model, then score every example by its error norm — for
    logistic regression the per-example loss gradient is
    (p − y)·[1, x1, x2], so

        margin = |p − y|          (misclassification confidence)
        el2n   = |p − y| · sqrt(1 + x1² + x2²)   (gradient L2 norm)

    High-EL2N examples are the hard/atypical ones pruning keeps (or
    drops, for noise filtering) — the learned complement to the
    heuristic difficulty proxy in ext_curriculum_stages. Training is the
    shared exact-GD fit (logreg_fit); scoring is one narrow projection
    over the checkpointed feature frame. sqrt/exp are IEEE-correctly-
    rounded on bit-identical inputs, so the rounded scores hash-compare
    across engines.

    Output: (id, y, margin, el2n).
    """
    from bigdatacw1_spark.operators.relational import stable_round

    feat = _logreg_features(docs, label_pred, text_col, id_col, chars_col)
    w0, w1, w2 = logreg_fit(feat, iters, lr)
    p = _logreg_sigmoid(w0, w1, w2)
    err = F.abs(p - F.col("y"))
    gnorm = F.sqrt(
        F.lit(1.0) + F.col("x1") * F.col("x1") + F.col("x2") * F.col("x2")
    )
    return feat.select(
        F.col(id_col),
        F.col("y").cast("int").alias("y"),
        stable_round(err, round_digits).alias("margin"),
        stable_round(err * gnorm, round_digits).alias("el2n"),
    )


def neyman_allocation(
    df: DataFrame,
    strata_col: str,
    value_col: str,
    budget: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """Neyman-optimal stratified sample allocation (Neyman 1934): for a
    fixed labeling/eval budget, the variance-minimizing number of draws
    per stratum is n_h ∝ N_h·σ_h — big AND internally-varied strata get
    more budget than big-but-uniform ones (proportional allocation
    over-samples the latter). The deliverable every eval-set build
    starts from.

    Exactness: per-stratum N, Σv, Σv² are one integer hash aggregate
    (DECIMAL(38) — v² sums overflow BIGINT early); σ_h uses the
    population-variance identity on exact integers with ONE fixed IEEE
    sequence, and the allocation floor(budget · w_h / W) is computed
    from rounded weights so both engines cut identically. Rounding the
    floor DOWN means Σ n_h <= budget (the remainder is the caller's
    tie-break — documented, not hidden). Strata with σ_h = 0 get weight
    0 (one row tells you everything about a constant stratum).

    Output: (stratum, n_rows, sigma, weight, n_alloc), one row per
    stratum — model-sized.
    """
    from bigdatacw1_spark.operators.relational import stable_round

    dec = "decimal(38,0)"
    g = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col(value_col).cast("long")).cast(dec).alias("s1"),
        F.sum((F.col(value_col).cast("long") * F.col(value_col).cast("long"))).cast(dec).alias("s2"),
    )
    n_d = F.col("n").cast("double")
    var = (F.col("s2").cast("double") / n_d) - (
        (F.col("s1").cast("double") / n_d) * (F.col("s1").cast("double") / n_d)
    )
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    w = stable_round(n_d * sigma, 4)
    gw = g.select("stratum", F.col("n").cast("long").alias("n_rows"), sigma.alias("__sig"), w.alias("weight"))
    tot = gw.agg(F.sum("weight").alias("wsum"))
    return (
        gw.crossJoin(F.broadcast(tot))
        .select(
            "stratum",
            "n_rows",
            stable_round(F.col("__sig"), 4).alias("sigma"),
            "weight",
            F.when(
                F.col("wsum") > 0.0,
                F.floor(F.lit(float(budget)) * F.col("weight") / F.col("wsum")).cast("int"),
            )
            .otherwise(F.lit(0))
            .alias("n_alloc"),
        )
        .orderBy("stratum")
    )
