"""Repetition-based quality statistics and filtering for web-text corpora
(the Gopher/MassiveText-style "repetitious document" gate that runs after
PII scrubbing and before dedup in a training pipeline).

Signals, all exactly defined so a SQL engine reproduces them bit-for-bit:

* ``top_token_frac``    — count of the most frequent token / n_tokens.
* ``top_bigram_frac``   — count of the most frequent bigram / n_bigrams.
* ``distinct_bigram_frac`` — distinct bigrams / n_bigrams (low ⇒ loops).

Ties on "most frequent" resolve to the lexicographically SMALLEST gram —
implemented as ``min(struct(-count, gram))`` so one codegen aggregate
carries both the count and the witness gram deterministically.

Distributed shape: tokenize once in the scan stage, explode grams
(bigrams ≈ input tokens — linear, not quadratic), ONE shuffle to
(doc, gram) counts with map-side partials, ONE narrow shuffle to doc
rollups; joins never appear. Per-doc array-expression alternatives
(``aggregate``/``transform`` over the token array) are interpreted, not
codegen — measured ~10× slower at corpus multiplicities, which is why
this is explode→groupBy (the engine-wide perf law; see the MinHash
signature builder, dedup.py).

Fractions are a single IEEE double division of two exact integers —
deterministic and engine-independent without rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ranking import _toks


def _top_and_counts(grams: DataFrame, id_col: str) -> DataFrame:
    """(id, total, n_distinct, top_gram, top_cnt) from an exploded
    (id, gram) frame. min(struct(-cnt, gram)) = max count, ties to the
    smallest gram."""
    per_gram = grams.groupBy(id_col, "gram").agg(F.count("*").alias("cnt"))
    top = F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("gram")))
    return per_gram.groupBy(id_col).agg(
        F.sum("cnt").alias("total"),
        F.count("*").alias("n_distinct"),
        top.alias("_top"),
    ).select(
        id_col,
        "total",
        "n_distinct",
        F.col("_top.gram").alias("top_gram"),
        (-F.col("_top.neg")).alias("top_cnt"),
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_tokens, top_token, top_token_frac, n_bigrams,
    distinct_bigram_frac, top_bigram, top_bigram_frac) per document with
    ≥1 token; docs with exactly 1 token carry NULL bigram columns."""
    toks = (
        docs.select(F.col(id_col), _toks(F.col(text_col)).alias("_t"))
        .filter(F.size("_t") > 0)
    )
    uni = toks.select(id_col, F.explode("_t").alias("gram"))
    n = F.size("_t")
    bi_pairs = F.arrays_zip(
        F.slice(F.col("_t"), 1, n - 1).alias("a"),
        F.slice(F.col("_t"), 2, n - 1).alias("b"),
    )
    bi = (
        toks.filter(n >= 2)
        .select(id_col, F.explode(bi_pairs).alias("p"))
        .select(id_col, F.concat_ws(" ", "p.a", "p.b").alias("gram"))
    )
    u = _top_and_counts(uni, id_col)
    b = _top_and_counts(bi, id_col)
    return (
        u.alias("u")
        .join(b.alias("b"), id_col, "left")
        .select(
            id_col,
            F.col("u.total").alias("n_tokens"),
            F.col("u.top_gram").alias("top_token"),
            (F.col("u.top_cnt") / F.col("u.total")).alias("top_token_frac"),
            F.coalesce(F.col("b.total"), F.lit(0)).alias("n_bigrams"),
            (F.col("b.n_distinct") / F.col("b.total")).alias(
                "distinct_bigram_frac"
            ),
            F.col("b.top_gram").alias("top_bigram"),
            (F.col("b.top_cnt") / F.col("b.total")).alias("top_bigram_frac"),
        )
    )


def repetition_filter(
    docs: DataFrame,
    max_top_token_frac: float = 0.20,
    max_top_bigram_frac: float = 0.18,
    min_distinct_bigram_frac: float = 0.30,
    min_tokens: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """repetition_stats + a keep/reject decision. ``reject_reason`` is the
    FIRST failing rule in the fixed order (short, top_token, top_bigram,
    distinct_bigram) — a CASE chain, so the decision is reproducible in
    any engine. Single-token docs have NULL bigram fractions; NULL
    comparisons are not-true, so they pass the bigram gates (the
    ``min_tokens`` gate is what rejects them)."""
    s = repetition_stats(docs, id_col=id_col, text_col=text_col)
    reason = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("top_token_frac") > max_top_token_frac, F.lit("top_token"))
        .when(
            F.col("top_bigram_frac") > max_top_bigram_frac, F.lit("top_bigram")
        )
        .when(
            F.col("distinct_bigram_frac") < min_distinct_bigram_frac,
            F.lit("low_distinct_bigram"),
        )
    )
    return s.select("*", reason.alias("reject_reason")).withColumn(
        "keep", F.col("reject_reason").isNull()
    )
