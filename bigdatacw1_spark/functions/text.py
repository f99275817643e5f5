"""Text-analysis column expressions (north-star extension, SURVEY.md §2.11).

All pure Catalyst built-ins (split/filter/transform/regexp/hash) — the
text hot path stays JVM-side with whole-stage codegen; no Python UDFs.
Each helper returns a Column usable on any string column, so the same
expressions serve the documents table, streaming payloads, or any other
corpus at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
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
