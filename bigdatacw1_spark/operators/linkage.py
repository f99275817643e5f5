"""Entity resolution / record linkage: candidate blocking + fuzzy verify.

The reference stores trader and security NAMES as free text (``trader_static``,
``equity_static.security_name`` — reference README.md:31,35) and screens on a
string sentinel rather than a key (`SQLQueries.sql:50`), so a user curating
that data needs approximate matching: "which names are the same entity up to
typos?". At training-data scale the same primitive powers fuzzy dedup of
titles/authors/URLs across crawl snapshots.

The naive form is an O(n²) cross join with an edit-distance filter — dead at
any scale. The implementation here is the standard prefix-filtering blocking
join from the record-linkage / set-similarity-join literature (PPJoin/ED-Join
family):

1. q-gram each normalized string (distinct character 3-grams, JVM
   ``transform``/``sequence`` — no Python).
2. Compute each gram's global document frequency (one hash aggregate).
3. Per string, keep only the ``k*q + 1`` RAREST grams (its *prefix* in the
   global frequency order, deterministic tie-break by gram text).
   Strings within edit distance k differ by at most k*q distinct grams —
   each edit destroys at most q grams — so two matching strings MUST share
   a gram inside these prefixes: the block join loses no true pair
   (count-filtering lemma, Gravano et al., VLDB 2001).
4. Join on the prefix grams (keyed shuffle on the gram — work is
   Σ bucket², and prefix grams are by construction the RAREST, so buckets
   stay small where naive gram-blocking floods on "the"/"ing" grams).
5. Verify candidates with exact ``levenshtein`` (JVM built-in) ≤ k.

Scale shape: linear explode (≤ |s| grams per string), one aggregate, one
bounded self-join, verification only on candidates. No cross join, no
Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["qgram_prefix", "blocked_fuzzy_pairs"]


def _norm(c: Column) -> Column:
    """Matching canonicalization: lowercase + collapse internal whitespace."""
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def qgram_prefix(
    names: DataFrame,
    id_col: str,
    name_col: str,
    q: int = 3,
    k: int = 1,
) -> DataFrame:
    """(id, gram) pairs restricted to each string's k*q+1 rarest grams.

    The global rarity order is (document_frequency ASC, gram ASC) — fully
    deterministic, so two engines (or two runs) pick identical prefixes.
    Strings shorter than q yield no grams and therefore no candidates;
    callers wanting exact matches for those handle them separately (they
    are cheap: an equality join).
    """
    prefix_len = k * q + 1
    nm = _norm(F.col(name_col))
    grams = names.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.length(nm) - (q - 1), F.lit(0))),
                    lambda i: F.substring(nm, i, q),
                )
            )
        ).alias("gram"),
    )
    df_counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("__df"))
    ranked = grams.join(df_counts, "gram").withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy(id_col).orderBy(F.col("__df").asc(), F.col("gram").asc())
        ),
    )
    return ranked.where(F.col("__rn") <= prefix_len).select(id_col, "gram")


def blocked_fuzzy_pairs(
    names: DataFrame,
    id_col: str,
    name_col: str,
    q: int = 3,
    k: int = 1,
) -> DataFrame:
    """All pairs (a, b, dist) with edit distance ≤ k, found via prefix
    blocking — NEVER a cross join. Complete: the prefix-filter lemma
    guarantees every true pair shares a prefix gram (strings with ≥ 1
    gram, i.e. length ≥ q). Output is (a, b) with a < b plus the exact
    levenshtein distance, including distance 0 (exact duplicates under
    normalization).
    """
    prefix = qgram_prefix(names, id_col, name_col, q, k)
    left = prefix.select(F.col(id_col).alias("a"), "gram")
    right = prefix.select(F.col(id_col).alias("b"), "gram")
    cands = (
        left.join(right, "gram")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates()
    )
    a_names = names.select(
        F.col(id_col).alias("a"), _norm(F.col(name_col)).alias("__na")
    )
    b_names = names.select(
        F.col(id_col).alias("b"), _norm(F.col(name_col)).alias("__nb")
    )
    verified = (
        cands.join(a_names, "a")
        .join(b_names, "b")
        # cheap length filter first: |len(a)-len(b)| > k can never verify
        .where(F.abs(F.length("__na") - F.length("__nb")) <= k)
        .withColumn("dist", F.levenshtein("__na", "__nb"))
        .where(F.col("dist") <= k)
    )
    return verified.select("a", "b", "dist")
