"""Text-analysis column expressions (north-star extension, SURVEY.md §2.11).

All pure Catalyst built-ins (split/filter/transform/regexp/hash) — the
text hot path stays JVM-side with whole-stage codegen; no Python UDFs.
Each helper returns a Column usable on any string column, so the same
expressions serve the documents table, streaming payloads, or any other
corpus at 100 TB.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdatacw1_spark.operators.relational import stable_round

# Tiny per-language stopword lists for the heuristic language ID.
# Deliberately small + hardcoded: the operator contract is "deterministic
# n-gram/stopword heuristic", not a trained model.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
    "de": ["der", "die", "das", "und", "ein", "zu", "ist", "nicht", "mit", "auf"],
    "es": ["el", "los", "de", "y", "un", "en", "es", "una", "por", "con"],
}

_PUNCT_CLASS = "[^.,;:!?]"


def tokens(text: Column | str, lowercase: bool = True) -> Column:
    """Whitespace tokenization with empty-token removal."""
    c = F.col(text) if isinstance(text, str) else text
    if lowercase:
        c = F.lower(c)
    return F.filter(F.split(c, r"\s+"), lambda w: w != "")


def bpe_ish_tokens(text: Column | str) -> Column:
    """Regex tokenization approximating a BPE pre-tokenizer: runs of
    letters, runs of digits, or single non-space symbols."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(c), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)


def word_ngrams(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles of a token array (dedup/similarity input).
    Empty array when the document has fewer than n tokens.

    Built by zipping the token array with its own shifted slices and
    null-compacting the ragged tail: ``concat`` null-propagates, so the
    last n-1 positions (where a shifted slice has run out) drop out. This
    is ~15× faster than indexing (``element_at`` per position is an
    interpreted per-element lookup inside a lambda; ``zip_with`` walks
    the arrays pairwise once)."""
    z = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.greatest(F.size(toks) - j, F.lit(0)))
        z = F.zip_with(z, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_compact(z)


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are sentence punctuation."""
    c = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(F.regexp_replace(c, _PUNCT_CLASS, ""))
    return n_punct / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(toks: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))
    return hits / F.greatest(F.size(toks), F.lit(1))


def _stopword_hits(toks: Column, words: list[str]) -> Column:
    # NB: the lambda must take exactly one positional arg — PySpark treats
    # a second parameter (even a defaulted one) as the index argument.
    def pred(tok: Column) -> Column:
        return tok.isin(*words)

    return F.size(F.filter(toks, pred))


def lang_scores(toks: Column) -> dict[str, Column]:
    """Stopword-hit count per language (the lang-ID signal)."""
    return {lang: _stopword_hits(toks, words) for lang, words in STOPWORDS.items()}


def lang_id(toks: Column) -> Column:
    """Argmax language by stopword hits; ties break in STOPWORDS order
    (en > fr > de > es), 'und' (undetermined) when no hits at all."""
    scores = lang_scores(toks)
    langs = list(STOPWORDS)
    best = F.greatest(*[scores[lg] for lg in langs])
    out = F.when(best <= 0, F.lit("und"))
    for lg in langs:
        out = out.when(scores[lg] == best, F.lit(lg))
    return out.otherwise(F.lit("und"))


def normalized_fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of case-folded, whitespace-collapsed
    text — catches trivially-reformatted duplicates (exact-dup family)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")))


def token_quality_score(toks: Column, text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: penalize very short docs, very
    short average tokens, and punctuation-heavy text. Deterministic and
    cheap — the pre-filter stage of a training-data pipeline."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.size(toks)
    avg_len = F.when(n > 0, F.length(F.concat_ws("", toks)) / n).otherwise(F.lit(0.0))
    len_score = F.least(n / F.lit(64.0), F.lit(1.0))
    tok_score = F.least(avg_len / F.lit(5.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(c) * 5, F.lit(1.0))
    return stable_round((len_score + tok_score + punct_score) / 3, 4)


def tf_idf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    round_digits: int = 4,
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    tf = term count / doc length; idf = ln(N / df) (unsmoothed — every
    term here has df >= 1). All JVM-side: explode → two keyed
    aggregations (term frequencies shuffle on (doc, term), document
    frequencies on term) → broadcast the tiny df/N sides back → rank
    window per doc. At 100 TB the df table is vocabulary-sized (≪ corpus)
    and broadcasts; the only corpus-sized shuffles are the two grouped
    counts, both with map-side combine.

    Ranking uses the ROUNDED score (then the term) so ordering is
    reproducible across engines at rounding boundaries.
    """
    from pyspark.sql import Window

    from bigdatacw1_spark.operators.relational import fan_out, stable_round

    toks = fan_out(df.select(id_col, text_col)).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )
    tf = (
        toks.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("tf", F.col("n") / F.sum("n").over(Window.partitionBy(id_col)))
    )
    doc_freq = toks.select(id_col, "term").distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(doc_freq), "term")
        .join(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("term"),
            stable_round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), round_digits
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .orderBy(id_col, "rnk")
    )


def dedup_lines(text: Column | str, sep: str = "\n") -> Column:
    """Intra-document duplicate-line removal (the C4/Gopher repetition
    trim): drop every line that already occurred EARLIER in the same
    document, preserving first-occurrence order, and rebuild the text.

    Returns struct(clean_text, n_lines, n_dup_lines). Pure array
    built-ins — split, indexed filter (keep line l at 0-based position i
    iff array_position's first hit is i+1), array_join — so the whole
    pass is JVM-side per row with no shuffle and no Python; at 100 TB
    this composes with c4_line_filter in the same projection."""
    c = F.col(text) if isinstance(text, str) else text
    lines = F.split(c, sep)
    kept = F.filter(lines, lambda l, i: F.array_position(lines, l) == i + 1)
    return F.struct(
        F.array_join(kept, sep).alias("clean_text"),
        F.size(lines).alias("n_lines"),
        (F.size(lines) - F.size(kept)).alias("n_dup_lines"),
    )


def bigram_lm_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> DataFrame:
    """Per-document surprisal under a corpus-trained bigram LM — the
    CCNet-style quality signal: documents whose word transitions are
    atypical for the corpus (gibberish, keyword stuffing, wrong-language
    fragments) score HIGH; formulaic boilerplate scores LOW.

    Model: P(w2|w1) = c(w1 w2) / c(w1 ·) with counts over the corpus
    itself (no smoothing needed — every scored bigram is in the training
    counts by construction). surprisal = -(1/N) Σ ln P over the doc's N
    bigram occurrences, i.e. ln(perplexity). Caveat of the self-trained
    unsmoothed form: a document of entirely corpus-unique words scores 0
    (hapax contexts make every transition deterministic) — "atypical"
    here means rare continuations of COMMON contexts; pair with oov_rate
    to catch the all-novel-vocabulary case.

    Scale shape: one corpus-sized explode feeds two grouped counts (both
    map-side combined); the bigram/context count tables are
    vocabulary²-bounded (≪ corpus) and join back on the bigram key. The
    per-doc float fold runs over the SORTED bigram list (sort_array →
    aggregate), so summation order — and therefore the rounded value —
    is engine-reproducible, same discipline as char_entropy."""
    bg_occ = df.select(
        F.col(id_col),
        F.explode(word_ngrams(tokens(text_col), 2)).alias("bigram"),
    ).withColumn("w1", F.split("bigram", " ")[0])

    bg_counts = bg_occ.groupBy("bigram").agg(F.count(F.lit(1)).alias("c"))
    ctx_counts = bg_occ.groupBy("w1").agg(F.count(F.lit(1)).alias("ctx"))

    doc_bg = bg_occ.groupBy(id_col, "bigram", "w1").agg(F.count(F.lit(1)).alias("n"))
    terms = (
        doc_bg.join(bg_counts, "bigram")
        .join(ctx_counts, "w1")
        .select(
            F.col(id_col),
            F.col("bigram"),
            F.col("n"),
            (F.col("n") * F.log(F.col("c").cast("double") / F.col("ctx").cast("double"))).alias("term"),
        )
    )
    agg = terms.groupBy(id_col).agg(
        F.sum("n").alias("n_bigrams"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("bigram", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("s"),
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            stable_round(-F.col("s") / F.col("n_bigrams"), round_digits).alias("surprisal"),
        )
    )


def oov_rate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own
    top-``vocab_size`` token vocabulary — a language-model-flavored
    quality signal (high OOV ⇒ boilerplate, code, junk encodings, or
    off-domain text) that needs no external model or wordlist.

    Shape: one exploded token pass feeds BOTH the vocabulary (global
    count → TakeOrdered top-K, deterministic (count DESC, token ASC)
    tie-break so the K-boundary is reproducible) and the per-doc scoring
    join. The vocabulary is K rows — broadcast — so scoring never
    shuffles the corpus tokens a second time; the only corpus-sized
    shuffles are the two keyed counts, both map-side combined. Output:
    (id, n_tokens, n_oov, oov_rate)."""
    from bigdatacw1_spark.operators.relational import fan_out

    toks = fan_out(df.select(id_col, text_col)).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("__in_vocab"))
    )
    oov = F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tokens"), oov.alias("n_oov"))
        .select(
            id_col,
            "n_tokens",
            "n_oov",
            stable_round(F.col("n_oov") / F.col("n_tokens"), 4).alias("oov_rate"),
        )
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split documents into overlapping token windows — the LLM
    context-window prep step. Entirely built-in (sequence → posexplode →
    slice → array_join): no Python in the hot path, rows expand
    partition-locally, and downstream repartitioning spreads chunks
    regardless of source document skew (one 1 GB document cannot pin a
    task — its chunks flow through the same explode).

    Output: (id, chunk_id, start_tok, n_tokens, chunk_text), one row per
    window of ``chunk_tokens`` tokens advancing by chunk_tokens-overlap.
    Empty documents yield one empty chunk (callers filter if unwanted).
    """
    step = chunk_tokens - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    toks = tokens(text_col)
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(step)
    )
    from bigdatacw1_spark.operators.relational import fan_out

    base = fan_out(df.select(id_col, text_col)).select(
        F.col(id_col), toks.alias("__toks"), F.posexplode(starts).alias("chunk_id", "start_tok")
    )
    piece = F.slice(F.col("__toks"), F.col("start_tok") + 1, chunk_tokens)
    return base.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.col("start_tok"),
        F.size(piece).alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


# PII patterns restricted to syntax valid in BOTH Java regex (Spark) and
# RE2 (DuckDB): character classes, bounded/unbounded repetition — no
# lookaround, no backreferences.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9-]{6,}[0-9]"


def redact_pii(text: Column | str) -> Column:
    """Redact email addresses and phone-shaped digit runs with typed
    placeholder tokens — the standard scrub pass before publishing a
    training corpus. Pure regexp_replace chain: JVM-side, codegen'd,
    no Python in the row path. Emails are replaced before phones so a
    digit-bearing local part is consumed as part of the email match.
    DuckDB equivalent: ``REGEXP_REPLACE(s, pat, '<EMAIL>', 'g')`` chained
    the same way (Spark's regexp_replace is global by default)."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, PHONE_RE, "<PHONE>")
    return c


#: Tracking parameters stripped during URL canonicalization.
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|ref)="


def html_to_text(html: Column | str) -> Column:
    """HTML → text extraction, the first pass of every web-corpus
    pipeline: drop <script>/<style> blocks and comments WITH their
    content, strip remaining tags, decode the common entities, collapse
    whitespace. A pure regexp_replace chain — JVM-side, codegen'd, no
    Python — deliberately ordered so named entities decode before &amp;
    (otherwise '&amp;lt;' would double-decode). This is the cheap
    structural pass (trafilatura-class boilerplate MODELS are a
    different, heavier tier); it is lossy by design: markup is treated
    as whitespace, never content."""
    c = F.col(html) if isinstance(html, str) else html
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]:
        c = F.regexp_replace(c, ent, ch)
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def canonicalize_url(url: Column | str) -> Column:
    """Canonical URL for web-corpus dedup — the highest-leverage dedup
    key a crawl pipeline has: lowercase scheme+host, keep the path
    verbatim (paths are case-significant), drop the fragment, strip
    tracking parameters (utm_*/fbclid/gclid/ref), and SORT the surviving
    query parameters so parameter order never splits a dup group.
    Pure regexp_extract + array ops in one projection; DuckDB mirrors
    each step 1:1 for the oracle. Unparseable input degrades to
    lowercase-trimmed passthrough rather than NULL."""
    c = F.col(url) if isinstance(url, str) else url
    scheme = F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    host = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    path = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(c, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    base = F.concat(F.lower(scheme), F.lit("://"), F.lower(host), path)
    canon = F.when(
        scheme == "", F.lower(F.trim(c))
    ).otherwise(
        F.when(qcanon == "", base).otherwise(F.concat(base, F.lit("?"), qcanon))
    )
    return canon


def gopher_rules(text: Column | str, lang: str = "en") -> Column:
    """Gopher-style document quality RULES as one struct of verdicts —
    the composed keep/drop gate (with per-rule reasons) a pre-training
    pipeline applies after line cleaning and before dedup:

      r_word_count     10 <= n_words <= 100000
      r_mean_word_len  3 <= mean word length <= 10
      r_stopwords      >= 2 stopword hits (natural-language evidence)
      r_top_word       most frequent word <= 30% of tokens
      r_distinct       distinct words >= 30% of tokens
      keep             AND of all rules

    Every threshold is evaluated by INTEGER cross-multiplication
    (3·n <= Σlen <= 10·n, 10·top <= 3·n, ...), so the verdicts are exact
    in any engine — no float ratios to drift at rule boundaries. Pure
    array built-ins, one projection, no shuffle; per-rule booleans let
    the drop-reason histogram come from the same scan."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    n = F.size(toks)
    sumlen = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    stops = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    distinct_toks = F.array_distinct(toks)
    n_distinct = F.size(distinct_toks)
    top_cnt = F.coalesce(
        F.array_max(
            F.transform(distinct_toks, lambda w: F.size(F.filter(toks, lambda x: x == w)))
        ),
        F.lit(0),
    )
    return F.struct(
        n.alias("n_words"),
        ((n >= 10) & (n <= 100000)).alias("r_word_count"),
        ((sumlen >= 3 * n) & (sumlen <= 10 * n) & (n > 0)).alias("r_mean_word_len"),
        (n_stop >= 2).alias("r_stopwords"),
        ((10 * top_cnt <= 3 * n) & (n > 0)).alias("r_top_word"),
        ((10 * n_distinct >= 3 * n) & (n > 0)).alias("r_distinct"),
        (
            (n >= 10) & (n <= 100000)
            & (sumlen >= 3 * n) & (sumlen <= 10 * n)
            & (n_stop >= 2)
            & (10 * top_cnt <= 3 * n)
            & (10 * n_distinct >= 3 * n)
        ).alias("keep"),
    )


def luhn_valid(digits: Column | str) -> Column:
    """Luhn checksum validation of a digit string — the precision filter
    behind credit-card PII detection: a 13-19 digit run is only worth
    redacting/flagging if its check digit verifies, which cuts the false
    positives from order ids and timestamps by ~10×. Pure array
    built-ins (reverse → indexed transform doubling every second digit,
    subtracting 9 on overflow → fold), JVM-side and codegen'd; DuckDB
    mirrors with list lambdas (1-based index there). NULL/empty or
    non-digit input yields false, not an error."""
    c = F.col(digits) if isinstance(digits, str) else digits
    ds = F.filter(F.split(F.reverse(c), ""), lambda x: x != "")
    # try_cast, not cast: ANSI mode would otherwise throw on non-digit
    # input before the validity guard can reject it.
    vals = F.transform(
        ds,
        lambda ch, i: F.when(
            i % 2 == 1,
            ch.try_cast("int") * 2 - F.when(ch.try_cast("int") * 2 > 9, 9).otherwise(0),
        ).otherwise(ch.try_cast("int")),
    )
    total = F.aggregate(vals, F.lit(0), lambda acc, x: acc + x)
    return F.coalesce((F.size(ds) > 0) & (total % 10 == 0), F.lit(False))


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    require_terminal_punct: bool = True,
    blacklist: tuple[str, ...] = ("lorem ipsum", "javascript"),
    drop_brace_docs: bool = True,
    min_kept_lines: int = 1,
) -> DataFrame:
    """C4-style heuristic corpus cleaning (Raffel et al. 2020, the C4
    construction rules): LINE-level filtering with document reconstruction
    plus document-level drops — the canonical pre-training cleanup pass.

    Line rules (a line survives iff ALL hold):
      - at least ``min_words`` whitespace-separated words
      - ends with a terminal punctuation mark (``. ! ? "``) when
        ``require_terminal_punct`` (C4 keeps only sentence-like lines;
        disable for corpora without punctuation)
    Document rules (the whole doc drops iff ANY holds):
      - lowercased text contains any ``blacklist`` phrase (C4 drops
        lorem-ipsum placeholders and javascript boilerplate)
      - contains a curly brace when ``drop_brace_docs`` (code, not prose)
      - fewer than ``min_kept_lines`` lines survive the line rules

    Output: one row per SURVIVING document — original columns plus
    ``clean_text`` (kept lines rejoined), ``n_lines``, ``n_kept``.

    Everything is array built-ins over ``split(text, '\\n')`` (filter/
    size/array_join with rlike inside the lambda) — single scan, no
    shuffle, no Python; at 100 TB this runs entirely inside whole-stage
    codegen and composes with any downstream dedup/quality stage."""
    text = F.col(text_col)
    lines = F.split(text, "\n")

    def line_ok(x: Column) -> Column:
        ok = F.size(F.filter(F.split(F.trim(x), r"\s+"), lambda w: w != "")) >= F.lit(min_words)
        if require_terminal_punct:
            ok = ok & F.trim(x).rlike('[.!?"]$')
        return ok

    kept = F.filter(lines, line_ok)
    out = df.withColumn("__kept", kept).withColumn("n_lines", F.size(lines))
    doc_ok = F.size(F.col("__kept")) >= F.lit(min_kept_lines)
    lowered = F.lower(text)
    for phrase in blacklist:
        doc_ok = doc_ok & ~lowered.contains(phrase.lower())
    if drop_brace_docs:
        doc_ok = doc_ok & ~text.contains("{") & ~text.contains("}")
    return (
        out.where(doc_ok)
        .withColumn("clean_text", F.array_join(F.col("__kept"), "\n"))
        .withColumn("n_kept", F.size(F.col("__kept")))
        .drop("__kept")
    )


def char_entropy(text: Column | str, digits: int = 4) -> Column:
    """Shannon entropy (bits) of the character distribution — the cheap
    gibberish/boilerplate detector: natural prose sits ~4 bits, repeated
    padding near 0, random base64 near 6. All array built-ins: split to
    chars, SORTED distinct alphabet, per-char counts via filter/size,
    then -Σ p·log2 p folded in alphabet order. The sorted alphabet makes
    the float summation order deterministic and engine-reproducible (the
    DuckDB oracle folds the same sorted list), so results hash-compare
    exactly after stable rounding. One scan, no shuffle, no Python."""
    c = F.col(text) if isinstance(text, str) else text
    chars = F.filter(F.split(c, ""), lambda x: x != "")
    alphabet = F.array_sort(F.array_distinct(chars))
    n = F.size(chars)
    counts = F.transform(alphabet, lambda a: F.size(F.filter(chars, lambda x: x == a)))
    p = lambda cnt: cnt.cast("double") / n.cast("double")  # noqa: E731
    ent = -F.aggregate(
        counts,
        F.lit(0.0),
        lambda acc, cnt: acc + p(cnt) * F.log2(p(cnt)),
    )
    return stable_round(ent, digits)


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 4,
) -> DataFrame:
    """Okapi BM25 top-k full-text retrieval over a corpus — the classic
    sparse-ranking half of a retrieval stack (the dense half is
    operators/similarity.cosine_topk). Lucene-style IDF:
    ln(1 + (N - df + 0.5)/(df + 0.5)), so scores are always positive.

    Scale shape: per-term tf is a row-local array filter (no explode, no
    per-term shuffle); the corpus statistics (N, avgdl, per-term df) are
    ONE tiny aggregate broadcast back as a single row, so the scoring
    pass is scan → broadcast-nested-loop(1 row) → TakeOrderedAndProject.
    Nothing shuffles on a per-token key; at 100 TB the cost is two scans
    of (id, tokens) and a top-k. The per-document score folds the query
    terms in their given (fixed) order, so float summation order — and
    the rounded value — is engine-reproducible.

    avgdl is computed as exact-integer SUM(dl)/N rather than AVG(dl) so
    both engines derive the identical double.
    """
    if not query_terms:
        raise ValueError("bm25_topk needs at least one query term")
    base = df.select(
        F.col(id_col), tokens(text_col).alias("toks")
    ).withColumn("dl", F.size("toks"))
    def _tf(term: str) -> Column:
        # NB: the lambda must stay single-arg — a two-arg lambda is the
        # (element, index) filter variant and the index would shadow term.
        return F.size(F.filter(F.col("toks"), lambda w: w == F.lit(term)))

    tf_cols = [_tf(t).alias(f"tf_{i}") for i, t in enumerate(query_terms)]
    per_doc = base.select(id_col, "dl", *tf_cols)
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.count_if(F.col(f"tf_{i}") > 0).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    j = per_doc.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(query_terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        tf = F.col(f"tf_{i}").cast("double")
        s_i = (
            idf
            * (tf * F.lit(k1 + 1.0))
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")))
        )
        score = s_i if score is None else score + s_i
    return (
        j.select(F.col(id_col), F.col("dl"), stable_round(score, round_digits).alias("score"))
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


# Default fixed BPE merge table (priority order) for bpe_segment — the
# shape a trained tokenizer ships: earlier merges apply first and later
# merges may consume their outputs (s+c -> sc, sc+a -> sca, ...).
BPE_MERGES_DEFAULT: list[tuple[str, str]] = [
    ("s", "c"), ("sc", "a"), ("sca", "n"),
    ("t", "h"), ("th", "e"),
    ("w", "i"), ("wi", "n"),
    ("o", "r"),
]


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-vocabulary BPE segmentation — the token-counting primitive
    for context-window budgeting with a REAL merge-table tokenizer
    instead of the whitespace approximation (tokens()/bpe_ish_tokens).

    Each document's alphanumeric words are exploded to characters in a
    flat string ('t  h  e | c  a  t': two spaces between symbols, ' | '
    between words, so merges can never cross a word boundary), then the
    merge table applies as SEQUENTIAL left-to-right non-overlapping
    string replacements ('t  h' -> 'th') — exactly greedy BPE merge
    application, and exactly the semantics of REPLACE in both engines,
    so token counts are integer-exact cross-engine. Everything is one
    row-local expression chain: no explode, no shuffle, no Python — a
    100 TB corpus tokenizes in a single scan.

    Output per doc: n_words, n_chars (initial symbol count), n_tokens
    (post-merge), chars_saved = n_chars - n_tokens.
    """
    merges = BPE_MERGES_DEFAULT if merges is None else merges
    words = F.filter(tokens(text_col), lambda w: w.rlike("^[a-z0-9]+$"))
    flat = F.array_join(
        F.transform(words, lambda w: F.array_join(F.split(w, ""), "  ")), " | "
    )
    for a, b in merges:
        flat = F.replace(flat, F.lit(f"{a}  {b}"), F.lit(a + b))
    n_words = F.size(words)
    n_chars = F.coalesce(
        F.aggregate(
            F.transform(words, lambda w: F.length(w)),
            F.lit(0),
            lambda acc, x: acc + x,
        ),
        F.lit(0),
    )
    seps = (
        F.length(flat) - F.length(F.replace(flat, F.lit("  "), F.lit("")))
    ) / F.lit(2)
    n_tokens = F.when(n_words == 0, F.lit(0)).otherwise(
        seps.cast("long") + n_words
    )
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        (n_chars - n_tokens).cast("long").alias("chars_saved"),
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Train a BPE merge table on the corpus itself — the real
    Sennrich-style algorithm, distributed: start from characters, then
    per round (1) count every adjacent symbol pair across the corpus
    (explode → hash aggregate with map-side combine), (2) take the
    most frequent pair (ties break lexicographically for determinism),
    (3) apply that merge corpus-wide as a left-to-right replacement,
    repeat. Returns a DataFrame (rank, mleft, mright, pair_count).

    Each round is one shuffle over pair counts; the argmax is a ONE-ROW
    driver collect per round (bounded by n_merges, the mixture_sample
    discipline), which then folds into the next round's expression as a
    literal. Cost is n_merges corpus scans — the published trade-off of
    exact BPE training; production vocabularies batch multiple merges
    per count round, trading exactness for passes, and the fixed-table
    applier (bpe_segment) is the hot-path consumer either way.
    """
    words0 = F.filter(tokens(text_col), lambda w: w.rlike("^[a-z0-9]+$"))
    flat0 = F.array_join(
        F.transform(words0, lambda w: F.array_join(F.split(w, ""), "  ")), " | "
    )
    state = df.select(F.col(id_col), flat0.alias("s"))
    spark = df.sparkSession
    found: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        word = F.explode(F.split(F.col("s"), r" \| ")).alias("w")
        syms = F.split(F.col("w"), "  ")
        pairs = F.array_compact(
            F.zip_with(
                syms,
                F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
                lambda a, b: F.when(b.isNotNull(), F.struct(a.alias("l"), b.alias("r"))),
            )
        )
        top = (
            state.select(word)
            .where(F.col("w") != "")
            .select(F.explode(pairs).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, c = top[0].l, top[0].r, int(top[0].c)
        found.append((rank, l, r, c))
        state = state.withColumn(
            "s", F.replace(F.col("s"), F.lit(f"{l}  {r}"), F.lit(l + r))
        )
    return spark.createDataFrame(
        found, "rank long, mleft string, mright string, pair_count long"
    )


def robots_star_rules(robots: Column | str) -> Column:
    """Parse a robots.txt body into the `User-agent: *` group's rules:
    array<struct<allow boolean, prefix string>>. Group selection is real
    (rules belong to the most recent User-agent line, so a preceding
    `User-agent: Googlebot` group is skipped and a following group
    terminates the `*` block); empty-prefix rules are ignored per RFC
    9309. Prefixes are treated as LITERAL strings — the RFC's
    longest-match core; Google's *-and-$ wildcard extension is out of
    scope and such rules should be pre-filtered upstream. Pure array
    built-ins, row-local."""
    c = F.col(robots) if isinstance(robots, str) else robots
    lines = F.transform(F.split(c, "\n"), lambda l: F.lower(F.trim(l)))
    ua_idx = F.array_position(lines, "user-agent: *")
    after = F.when(ua_idx > 0, F.slice(lines, ua_idx + 1, F.size(lines))).otherwise(
        F.array().cast("array<string>")
    )
    next_ua = F.array_compact(
        F.transform(
            after,
            lambda l, i: F.when(l.startswith("user-agent:"), i + 1),
        )
    )
    cut = F.coalesce(F.try_element_at(next_ua, F.lit(1)) - 1, F.size(after))
    group = F.slice(after, 1, cut)
    rules = F.transform(
        group,
        lambda l: F.when(
            l.startswith("allow:"),
            F.struct(
                F.lit(True).alias("allow"),
                F.trim(F.substring_index(l, "allow:", -1)).alias("prefix"),
            ),
        ).when(
            l.startswith("disallow:"),
            F.struct(
                F.lit(False).alias("allow"),
                F.trim(F.substring_index(l, "disallow:", -1)).alias("prefix"),
            ),
        ),
    )
    return F.filter(F.array_compact(rules), lambda r: r["prefix"] != "")


def robots_allowed(rules: Column, path: Column) -> Column:
    """RFC 9309 decision: the longest matching prefix wins; at equal
    length Allow beats Disallow; no match → allowed. Returns
    struct<allowed boolean, match_len int>. The fold key len*2+allow
    encodes both tie-break levels in one integer."""
    matches = F.filter(rules, lambda r: path.startswith(r["prefix"]))
    best = F.aggregate(
        matches,
        F.struct(F.lit(-1).alias("key"), F.lit(True).alias("allow"), F.lit(-1).alias("mlen")),
        lambda acc, r: F.when(
            F.length(r["prefix"]) * 2 + r["allow"].cast("int") > acc["key"],
            F.struct(
                (F.length(r["prefix"]) * 2 + r["allow"].cast("int")).alias("key"),
                r["allow"].alias("allow"),
                F.length(r["prefix"]).alias("mlen"),
            ),
        ).otherwise(acc),
    )
    return F.struct(
        best["allow"].alias("allowed"), best["mlen"].alias("match_len")
    )


def bm25_corpus_stats(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Collect the frozen BM25 index statistics (N, avgdl, per-term df)
    as one driver-side row — the 'build the index offline' half of
    online scoring. Bounded: one row regardless of corpus size."""
    base = df.select(F.col(id_col), tokens(text_col).alias("toks")).withColumn(
        "dl", F.size("toks")
    )
    def _tf(term: str) -> Column:
        # single-arg lambda only: a second (even defaulted) parameter is
        # the (element, index) filter variant and would shadow the term.
        return F.size(F.filter(F.col("toks"), lambda w: w == F.lit(term)))

    tf_cols = [_tf(t) for t in query_terms]
    row = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.count_if(tf_cols[i] > 0).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    ).head()
    return {
        "n_docs": int(row["n_docs"]),
        "avgdl": float(row["avgdl"]),
        "df": [int(row[f"df_{i}"]) for i in range(len(query_terms))],
    }


def bm25_score_frozen(
    df: DataFrame,
    stats: dict,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 4,
) -> DataFrame:
    """Score documents against FROZEN index statistics embedded as plan
    literals — the online-indexing shape: the index stats are built
    offline (bm25_corpus_stats), new documents score statelessly as
    they arrive, so the same expression runs on a batch frame or a
    streaming micro-batch with no join and no state. Identical IEEE
    sequence to bm25_topk's scoring pass."""
    toks = tokens(text_col)
    dl = F.size(toks)

    def _tf(term: str) -> Column:
        # single-arg lambda only (see bm25_corpus_stats)
        return F.size(F.filter(toks, lambda w: w == F.lit(term)))

    score = None
    for i, term in enumerate(query_terms):
        tf = _tf(term).cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.lit(stats["n_docs"]) - F.lit(stats["df"][i]) + F.lit(0.5))
            / (F.lit(stats["df"][i]) + F.lit(0.5))
        )
        s_i = (
            idf
            * (tf * F.lit(k1 + 1.0))
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(stats["avgdl"])))
        )
        score = s_i if score is None else score + s_i
    return df.select(
        F.col(id_col), dl.alias("dl"), stable_round(score, round_digits).alias("score")
    )


#: UTF-8 bytes mis-decoded as a single-byte codec ("mojibake") → the
#: intended character. Generated from the characters themselves for BOTH
#: common wrong codecs — cp1252 (yields the familiar visible "â€™", "Ã©")
#: and latin-1 (same idea but the C1 range stays as control characters) —
#: and ordered longest-first so 3-byte sequences repair before their
#: 2-byte prefixes can match. Covers the high-frequency cases ftfy fixes
#: in web crawl text: curly punctuation (E2 80 xx), ellipsis/dashes, and
#: Latin-1 accents (C3 xx).
_MOJIBAKE_TARGETS = "’ ‘ “ ” – — … é è ê á à ó ò ú ü ö ä ñ ç í ß".split()

def _mojibake_table() -> list[tuple[str, str]]:
    fixes: list[tuple[str, str]] = []
    for ch in _MOJIBAKE_TARGETS:
        raw = ch.encode("utf-8")
        for codec in ("cp1252", "latin-1"):
            try:
                bad = raw.decode(codec)
            except UnicodeDecodeError:
                continue  # bytes unmapped in cp1252 (0x81/0x8D/0x8F/0x90/0x9D)
            if bad != ch and (bad, ch) not in fixes:
                fixes.append((bad, ch))
    # longest corruption first; deterministic tie-break for reproducibility
    fixes.sort(key=lambda p: (-len(p[0]), p[0]))
    return fixes


MOJIBAKE_FIXES: list[tuple[str, str]] = _mojibake_table()


def fix_mojibake(text: Column | str) -> Column:
    """Repair UTF-8-decoded-as-Latin-1 mojibake (the ftfy core case):
    each known corruption sequence is replaced by the character the
    original bytes encoded. A pure ordered REPLACE chain — row-local,
    JVM-side, no UDF — so it runs at scan speed and composes with any
    quality filter. Sequences are matched longest-first; characters
    outside the table pass through untouched (repair is conservative:
    never guess, never drop)."""
    c = F.col(text) if isinstance(text, str) else text
    for bad, good in MOJIBAKE_FIXES:
        c = F.replace(c, F.lit(bad), F.lit(good))
    return c


def compression_ratio(text: Column | str) -> Column:
    """DEFLATE compression ratio per document: len(zlib(text)) /
    len(text-bytes) — the cheap universal redundancy detector
    (RefinedWeb/CCNet family): boilerplate, repeated spans, and
    templated spam compress far below ~0.4 while natural prose sits
    around 0.5–0.8. zlib is per-row imperative work no JVM built-in
    expresses, so this is a legitimate escape-hatch case — an
    Arrow-batched pandas UDF (one Python call per ~10k-row batch),
    never a row-at-a-time Python UDF. Deterministic for a fixed zlib
    (level pinned at 6); empty/null text maps to ratio 0.0."""
    # pd must be a MODULE-level import: with `from __future__ import
    # annotations` these hints are strings pandas_udf resolves against
    # module globals
    @F.pandas_udf("double")
    def _ratio(s: pd.Series) -> pd.Series:
        import zlib

        def one(v) -> float:
            if v is None:
                return 0.0
            b = str(v).encode("utf-8")
            if not b:
                return 0.0
            return len(zlib.compress(b, 6)) / len(b)

        return s.map(one)

    c = F.col(text) if isinstance(text, str) else text
    return _ratio(c)


def nb_text_classifier(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_k: int = 1000,
) -> DataFrame:
    """Multinomial Naive Bayes text classifier, trained and applied in
    one distributed pass structure — the LEARNED counterpart of the
    n-gram-heuristic lang_id (fastText-style supervised lang-id is
    exactly this plus subwords): per-class token likelihoods with
    Laplace smoothing over a deterministic top-``vocab_k`` vocabulary,
    class priors from document counts, argmax of

        score(d, c) = ln P(c) + Σ_{tok ∈ d ∩ V} ln P(tok | c)

    Exactness discipline (logreg_fit family): every ln term is
    quantized to an integer (floor(x·1e9 + 0.5)) BEFORE summation, so
    per-document scores are exact BIGINT sums — associative,
    partition-order-free, bit-identical cross-engine; ties in the
    argmax break on the smaller class label. OOV tokens are ignored
    (they carry no class signal under a shared vocabulary).

    Scale shape: training is two hash aggregates (class-token counts
    over the vocab — a (classes × vocab_k)-bounded table — and class
    priors); the densified log-prob table BROADCASTS; scoring is one
    explode + broadcast join + one (doc, class) hash aggregate with
    map-side combine; the argmax is a doc-partitioned window.

    Output: (id, label, pred, correct) — self-prediction on the
    training corpus (the resubstitution check; held-out evaluation
    composes with train_test_split).
    """
    from pyspark.sql import Window

    toks = df.select(F.col(id_col), F.col(label_col).alias("__y"), tokens(text_col).alias("tk"))
    ex = toks.select(id_col, "__y", F.explode("tk").alias("tok"))

    vocab = (
        ex.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(vocab_k)
        .select("tok")
    )
    exv = ex.join(F.broadcast(vocab), "tok")

    cls = toks.groupBy(F.col("__y").alias("c")).agg(F.count(F.lit(1)).alias("n_docs"))
    n_total = cls.select(F.sum("n_docs").alias("t"))
    cnt = exv.groupBy(F.col("__y").alias("c"), "tok").agg(F.count(F.lit(1)).alias("cnt"))
    tot = cnt.groupBy("c").agg(F.sum("cnt").alias("tot"))
    vsize = vocab.count()

    q = lambda x: F.floor(x * F.lit(1.0e9) + F.lit(0.5)).cast("long")  # noqa: E731
    dense = (
        vocab.crossJoin(tot)
        .join(cnt, ["c", "tok"], "left")
        .select(
            "c",
            "tok",
            q(
                F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1)).cast("double")
                    / (F.col("tot") + F.lit(vsize)).cast("double")
                )
            ).alias("qterm"),
        )
    )
    priors = cls.crossJoin(n_total).select(
        "c", q(F.log(F.col("n_docs").cast("double") / F.col("t").cast("double"))).alias("qprior")
    )

    contrib = exv.join(F.broadcast(dense), "tok").groupBy(id_col, "c").agg(
        F.sum("qterm").alias("qsum")
    )
    # every doc must score EVERY class (a doc whose vocab tokens miss a
    # class entirely still has that class's prior): dense doc×class grid
    grid = toks.select(id_col, "__y").crossJoin(F.broadcast(priors))
    scored = grid.join(contrib, [id_col, "c"], "left").select(
        id_col,
        "__y",
        "c",
        (F.coalesce(F.col("qsum"), F.lit(0)) + F.col("qprior")).alias("qscore"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("qscore"), F.asc("c"))
    best = scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return best.select(
        F.col(id_col),
        F.col("__y").alias("label"),
        F.col("c").alias("pred"),
        (F.col("c") == F.col("__y")).alias("correct"),
    )


def mlm_mask(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mask_rate_u32: int = 644245094,  # floor(0.15 * 2^32)
    vocab_k: int = 1000,
) -> DataFrame:
    """BERT-style masked-LM example assembly (Devlin et al. 2019): mask
    ~15% of token positions; of the masked, ~80% become ``[MASK]``,
    ~10% a corpus token, ~10% stay unchanged (so the model cannot rely
    on ``[MASK]`` always marking a target). The RANDOMNESS IS A HASH:
    both draws for position i are md5(id || ':' || i) slices compared
    against integer thresholds, so the same corpus always yields the
    same examples on any cluster — reproducibility no RNG-based
    masker gives — and any engine can replay them bit-for-bit.

    The random-replacement token is picked from the deterministic
    top-``vocab_k`` vocabulary by the draw mod |V|; the sorted vocab
    rides in as ONE broadcast row (model-sized, never a per-row
    lookup join). Everything else is per-row array built-ins: one
    narrow projection over the corpus.

    Output: (id, n_tokens, n_masked, masked_text) — masked_text joins
    the post-masking tokens with spaces.
    """
    vocab_row = (
        df.select(F.explode(tokens(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(vocab_k)
        # sort key (-n, tok): count DESC with token ASC tie-break — the
        # same total order the LIMIT cut above uses, so both agree.
        .agg(
            F.sort_array(
                F.collect_list(F.struct((-F.col("n")).alias("nn"), F.col("tok")))
            ).alias("vs")
        )
        .select(F.transform("vs", lambda s: s["tok"]).alias("vocab"))
    )
    base = df.select(F.col(id_col), tokens(text_col).alias("tk")).crossJoin(
        F.broadcast(vocab_row)
    )

    def u32(i: Column, salt: str) -> Column:
        h = F.md5(
            F.concat(F.col(id_col).cast("string"), F.lit(":"), i.cast("string"), F.lit(salt))
        )
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")

    def masked_tok(tk: Column, vocab: Column):
        def per_pos(i: Column) -> Column:
            orig = F.element_at(tk, i.cast("int"))
            pick = u32(i, "m")
            kind = u32(i, "k") % F.lit(10)  # 0-7 [MASK], 8 random, 9 keep
            repl = F.element_at(
                vocab, (u32(i, "r") % F.size(vocab) + F.lit(1)).cast("int")
            )
            return F.when(
                pick < F.lit(mask_rate_u32),
                F.when(kind <= F.lit(7), F.lit("[MASK]"))
                .when(kind == F.lit(8), repl)
                .otherwise(orig),
            ).otherwise(orig)

        return F.transform(F.sequence(F.lit(1), F.size(tk)), per_pos)

    out_toks = masked_tok(F.col("tk"), F.col("vocab"))
    n_masked = F.size(
        F.filter(
            F.sequence(F.lit(1), F.size("tk")),
            lambda i: u32(i, "m") < F.lit(mask_rate_u32),
        )
    )
    return base.where(F.size("tk") > 0).select(
        F.col(id_col),
        F.size("tk").alias("n_tokens"),
        n_masked.alias("n_masked"),
        F.array_join(out_toks, " ").alias("masked_text"),
    )


def span_corrupt(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stride: int = 7,
    start_rate_u32: int = 1503238553,  # floor(0.35 * 2^32)
) -> DataFrame:
    """T5-style span-corruption example assembly (Raffel et al. 2020):
    replace token spans with numbered sentinels in the input and emit
    the (sentinel, original tokens) pairs as the target — the seq2seq
    denoising objective's data transform. DETERMINISTIC variant of
    T5's sampled spans: span starts are drawn only at every
    ``stride``-th position (md5 draw vs an integer threshold) and span
    length is 2 + (md5 draw mod 2) ∈ {2, 3}; since stride > max span,
    spans can NEVER overlap, so the whole transform is position-parallel
    (T5's sequential sampled-span walk does not distribute; this policy
    keeps its corruption statistics ~35%·1/7·2.5 ≈ 12.5% of tokens and
    is replayable bit-for-bit by any engine).

    One narrow projection; per-position work scans the (n/stride)-sized
    span list. Output: (id, n_tokens, n_spans, input_text, target_text).
    """
    tk = tokens(text_col)
    base = df.select(F.col(id_col), tk.alias("tk")).where(F.size("tk") > 0)

    def u32(i: Column, salt: str) -> Column:
        h = F.md5(
            F.concat(F.col(id_col).cast("string"), F.lit(":"), i.cast("string"), F.lit(salt))
        )
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")

    n = F.size("tk")
    starts = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: ((i - 1) % F.lit(stride) == 0)
        & (i + 2 <= n)
        & (u32(i, "s") < F.lit(start_rate_u32)),
    )
    spans = base.select(
        F.col(id_col),
        F.col("tk"),
        starts.alias("ss"),
    ).select(
        F.col(id_col),
        F.col("tk"),
        F.col("ss"),
        F.transform(F.col("ss"), lambda s: F.lit(2) + u32(s, "l") % F.lit(2)).alias("ls"),
    )

    ss, ls, tkc = F.col("ss"), F.col("ls"), F.col("tk")
    k_of = lambda i: F.size(F.filter(ss, lambda s: s < i))  # noqa: E731
    covered = lambda i: F.exists(  # noqa: E731
        F.arrays_zip(ss, ls), lambda z: (z["ss"] <= i) & (i < z["ss"] + z["ls"])
    )
    is_start = lambda i: F.array_contains(ss, i)  # noqa: E731

    inp = F.array_compact(
        F.transform(
            F.sequence(F.lit(1), F.size(tkc)),
            lambda i: F.when(
                is_start(i),
                F.concat(F.lit("<extra_id_"), k_of(i).cast("string"), F.lit(">")),
            )
            .when(covered(i), F.lit(None).cast("string"))
            .otherwise(F.element_at(tkc, i.cast("int"))),
        )
    )
    tgt = F.transform(
        F.arrays_zip(ss, ls),
        lambda z: F.concat(
            F.lit("<extra_id_"),
            F.size(F.filter(ss, lambda s: s < z["ss"])).cast("string"),
            F.lit("> "),
            F.array_join(F.slice(tkc, z["ss"], z["ls"]), " "),
        ),
    )
    return spans.select(
        F.col(id_col),
        F.size("tk").alias("n_tokens"),
        F.size("ss").alias("n_spans"),
        F.array_join(inp, " ").alias("input_text"),
        F.array_join(tgt, " ").alias("target_text"),
    )
