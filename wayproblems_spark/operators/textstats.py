"""Text analysis for training-data pipelines — all built-in column
expressions (JVM, whole-stage codegen): language-ID heuristic, quality
scoring, token counting, document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny marker-word sets for the n-gram/stopword language heuristic
_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "für", "auf", "ein"),
    "fr": ("le", "la", "les", "et", "est", "pour", "dans", "que", "une", "des"),
    "es": ("el", "la", "los", "y", "es", "que", "para", "con", "una", "por"),
}

_STOPWORDS = tuple(sorted({w for ws in _LANG_MARKERS.values() for w in ws}))


def tokens(text_col) -> Column:
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def token_count(text_col) -> Column:
    """Whitespace tokenization; empty string → 0."""
    return F.when(F.trim(text_col) == "", F.lit(0)).otherwise(F.size(tokens(text_col)))


def bpe_ish_token_count(text_col) -> Column:
    """BPE-ish regex tokenizer: words, numbers, single punctuation marks."""
    return F.size(
        F.regexp_extract_all(
            F.lower(text_col), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0)
        )
    )


def punct_ratio(text_col) -> Column:
    punct = F.length(F.regexp_replace(text_col, r"[^.,;:!?'\"()\[\]-]", ""))
    return punct.cast("double") / F.greatest(F.length(text_col), F.lit(1)).cast("double")


def stopword_ratio(text_col) -> Column:
    toks = tokens(text_col)
    sw = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS)))
    return sw.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def mean_token_len(text_col) -> Column:
    toks = tokens(text_col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(text_col) -> Column:
    """[0,1] composite: long enough, sane punctuation, some stopwords,
    plausible mean token length — the classic cheap web-text filters."""
    n = token_count(text_col).cast("double")
    len_ok = F.least(n / 20.0, F.lit(1.0))
    p = punct_ratio(text_col)
    punct_ok = F.when(p < 0.2, 1.0).otherwise(F.greatest(F.lit(0.0), 1.0 - (p - 0.2) * 5.0))
    s = stopword_ratio(text_col)
    stop_ok = F.least(s * 5.0, F.lit(1.0))
    m = mean_token_len(text_col)
    mtl_ok = F.when((m >= 2.5) & (m <= 12.0), 1.0).otherwise(0.3)
    return (len_ok * 0.3 + punct_ok * 0.2 + stop_ok * 0.3 + mtl_ok * 0.2)


def lang_id(text_col) -> Column:
    """argmax over marker-word hit counts; 'und' (undetermined) when zero."""
    toks = tokens(text_col)
    scores = [
        F.struct(
            F.size(F.filter(toks, lambda t: t.isin(*words))).alias("hits"),
            F.lit(code).alias("code"),
        )
        for code, words in sorted(_LANG_MARKERS.items(), reverse=True)
    ]
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    return F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und"))


def fingerprint(text_col) -> Column:
    """Order-sensitive rolling fingerprint: xxhash64 folded over normalized
    tokens (aggregate → one pass, no Python)."""
    toks = F.filter(
        F.split(F.regexp_replace(F.lower(text_col), r"[^a-z0-9\s]", ""), r"\s+"),
        lambda t: t != "",
    )
    return F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: F.xxhash64(acc, t)
    )


def term_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, n) corpus-wide term frequencies over the normalized
    whitespace tokens. explode → hash aggregate: the explosion feeds a
    map-side partial count, so the shuffle carries one row per DISTINCT
    term per task, not per token occurrence — the standard vocabulary-
    build shape at corpus scale."""
    toks = F.filter(
        F.split(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", ""), r"\s+"),
        lambda t: t != "",
    )
    return (
        df.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )


def vocab_topk(df: DataFrame, k: int, text_col: str = "text") -> DataFrame:
    """Top-k vocabulary by frequency, deterministic ties (term asc).
    orderBy+limit plans as TakeOrderedAndProject — each task keeps a
    k-row heap, the driver merges |tasks|·k rows; no global sort."""
    return term_counts(df, text_col).orderBy(F.desc("n"), F.asc("term")).limit(k)


def document_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return df.withColumns(
        {
            "token_count": token_count(t),
            "bpe_token_count": bpe_ish_token_count(t),
            "punct_ratio": F.round(punct_ratio(t), 6),
            "stopword_ratio": F.round(stopword_ratio(t), 6),
            "mean_token_len": F.round(mean_token_len(t), 6),
            "quality": F.round(quality_score(t), 6),
            "lang_guess": lang_id(t),
            "fingerprint": fingerprint(t),
        }
    )
