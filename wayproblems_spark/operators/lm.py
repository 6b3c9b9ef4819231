"""N-gram language-model perplexity scoring — the CCNet / Gopher /
RefinedWeb quality-filtering recipe: train a small LM on a trusted
reference slice (Wikipedia in the published pipelines), score every
corpus document by its per-token cross-entropy under that LM, and keep
the low-perplexity (reference-like) head. KenLM's 5-gram model is the
published tool; its relational core — n-gram count tables + add-one
smoothed log-probabilities + a per-document rollup — is what this
module implements, as pure DataFrame algebra (zero Python on the data
plane).

Model (exactly reproducible cross-engine):

  unigram:  logp(w)      = ln(c(w) + 1) − ln(C + V)
  bigram:   p(w2|w1)     = λ·(c(w1,w2) + 1)/(c(w1·) + V)
                         + (1−λ)·(c(w2) + 1)/(C + V)
  doc cross-entropy H    = −(Σ_token logp) / n_tokens,   ppl = e^H

where c/C are reference-slice counts, V the reference vocabulary size
(+1 for OOV in the bigram denominator share). Every ln() argument that
must match across engines is an exact integer or a ratio of exact
integers composed identically; per-token log-probs accumulate through
decimal(38,12) (the BM25/DSIR trick, ranking.py / importance.py) so the
document sum is associative — bit-stable across partitionings and
SQL-replicable to 6 decimals.

Distributed shape: reference counts are one explode → map-side-partial
count each (unigram, bigram, context); scoring joins the corpus's
(doc, gram, cnt) frame against the count tables — broadcast by default
(a reference-slice vocab is ~10⁶ rows even at web scale; knob for
shuffle join otherwise); C/V scalars fold into the plan as literals.
One shuffle for the per-doc rollup. Nothing quadratic, nothing driver-
side but two scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ranking import _toks

_DEC = "decimal(38,12)"


def _unigram_counts(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.select(F.explode(_toks(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )


def _bigram_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """(w1, w2, c) over adjacent token pairs — slice/zip, no UDF."""
    toks = docs.select(_toks(F.col(text_col)).alias("t")).filter(
        F.size("t") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.size("t") - 1),
                F.slice(F.col("t"), 2, F.size("t") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    )
    return pairs.groupBy("p.w1", "p.w2").agg(F.count("*").alias("c"))


def train_unigram_lm(ref: DataFrame, text_col: str = "text"):
    """Returns ``(lm_df, stats)``: ``lm_df`` = (term, logp) with add-one
    smoothing, ``stats`` = ``{"C": total_tokens, "V": vocab_size}`` —
    the two scalars a scorer folds into its plan (OOV logp is
    ``−ln(C+V)``, derivable from stats alone)."""
    cnt = _unigram_counts(ref, text_col)
    row = cnt.agg(
        F.sum("c").alias("C"), F.count("*").alias("V")
    ).collect()[0]
    stats = {"C": int(row["C"] or 0), "V": int(row["V"])}
    denom = F.log(F.lit(float(stats["C"] + stats["V"])))
    lm = cnt.select(
        "term", (F.log(F.col("c") + F.lit(1)) - denom).alias("logp")
    )
    return lm, stats


def perplexity(
    docs: DataFrame,
    lm: DataFrame,
    stats: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_lm: bool = True,
) -> DataFrame:
    """(id, n_tokens, entropy, ppl) per document under a unigram LM from
    :func:`train_unigram_lm`. ``entropy`` is rounded to 6 decimals and
    ``ppl = exp(entropy)`` is derived from the ROUNDED value, so both
    columns are cross-engine exact (the raw sum is decimal-accumulated;
    the only float ops after it are composed identically in the SQL
    oracle). Empty documents score NULL entropy/ppl, n_tokens = 0."""
    if not {"C", "V"} <= stats.keys():
        raise ValueError(f"stats must carry C and V, got {sorted(stats)}")
    oov = -F.log(F.lit(float(stats["C"] + stats["V"])))
    lmj = F.broadcast(lm) if broadcast_lm else lm
    per_term = (
        docs.select(
            F.col(id_col), F.explode(_toks(F.col(text_col))).alias("term")
        )
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("cnt"))
        .join(lmj, "term", "left")
        .select(
            id_col,
            "cnt",
            (F.col("cnt") * F.coalesce(F.col("logp"), oov)).alias("t"),
        )
    )
    agg = per_term.groupBy(id_col).agg(
        F.sum("cnt").alias("n_tokens"),
        F.sum(F.col("t").cast(_DEC)).alias("s"),
    )
    scored = agg.select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(
            -(F.col("s").cast("double")) / F.col("n_tokens").cast("double"),
            6,
        ).alias("entropy"),
    ).withColumn("ppl", F.round(F.exp(F.col("entropy")), 6))
    # empty docs never reach the explode — restore them with NULL scores
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .fillna({"n_tokens": 0})
    )


def perplexity_filter(
    docs: DataFrame,
    lm: DataFrame,
    stats: dict,
    max_ppl: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep documents with ``ppl <= max_ppl`` (the CCNet "head/middle"
    cut). Empty documents are dropped (no evidence they match the
    reference distribution).

    Makes two passes over ``docs`` (score + join back) — persist the
    input first if it is itself an expensive pipeline rather than a
    table scan."""
    scored = perplexity(docs, lm, stats, id_col=id_col, text_col=text_col)
    return docs.join(
        scored.filter(F.col("ppl") <= F.lit(max_ppl)).select(id_col),
        id_col,
    )


def interpolated_bigram_logprob(
    ref: DataFrame,
    text_col: str = "text",
    lam: float = 0.7,
):
    """Returns ``(bi_df, uni_df, stats)`` for an interpolated bigram LM:
    ``bi_df`` = (w1, w2, c), ``uni_df`` = (term, c, ctx) where ``ctx``
    is the token's count as a bigram LEFT context, ``stats`` = {C, V}.
    Scoring composes ``λ·(c12+1)/(ctx1+V) + (1−λ)·(c2+1)/(C+V)`` —
    kept as count tables (not pre-logged) so the scorer's float
    composition is explicit and SQL-replicable."""
    if not 0.0 < lam < 1.0:
        raise ValueError(f"lam must be in (0,1), got {lam}")
    uni = _unigram_counts(ref, text_col)
    bi = _bigram_counts(ref, text_col)
    ctx = bi.groupBy(F.col("w1").alias("term")).agg(
        F.sum("c").alias("ctx")
    )
    row = uni.agg(F.sum("c").alias("C"), F.count("*").alias("V")).collect()[0]
    stats = {"C": int(row["C"] or 0), "V": int(row["V"]), "lam": lam}
    uni = uni.join(ctx, "term", "left").fillna({"ctx": 0})
    return bi, uni, stats


def bigram_perplexity(
    docs: DataFrame,
    bi: DataFrame,
    uni: DataFrame,
    stats: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_lm: bool = True,
) -> DataFrame:
    """(id, n_tokens, entropy, ppl) under the interpolated bigram LM of
    :func:`interpolated_bigram_logprob`; scores the doc's token-pair
    stream (first token unscored, matching the conditional model).
    Documents with < 2 tokens score NULL. Float composition per pair:
    ``ln(λ·(c12+1)/(ctx1+V) + (1−λ)·(c2+1)/(C+V))`` with every
    sub-expression an IEEE double op on integer-exact inputs, summed
    through decimal(38,12)."""
    lam, c_tot, v = float(stats["lam"]), stats["C"], stats["V"]
    toks = docs.select(
        F.col(id_col), _toks(F.col(text_col)).alias("t")
    ).filter(F.size("t") >= 2)
    pairs = (
        toks.select(
            id_col,
            F.explode(
                F.zip_with(
                    F.slice(F.col("t"), 1, F.size("t") - 1),
                    F.slice(F.col("t"), 2, F.size("t") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p"),
        )
        .select(id_col, "p.w1", "p.w2")
        .groupBy(id_col, "w1", "w2")
        .agg(F.count("*").alias("cnt"))
    )
    b = F.broadcast if broadcast_lm else (lambda d: d)
    j = (
        pairs.join(
            b(bi.select("w1", "w2", F.col("c").alias("c12"))),
            ["w1", "w2"],
            "left",
        )
        .join(
            b(
                uni.select(
                    F.col("term").alias("w1"), F.col("ctx").alias("ctx1")
                )
            ),
            "w1",
            "left",
        )
        .join(
            b(uni.select(F.col("term").alias("w2"), F.col("c").alias("c2"))),
            "w2",
            "left",
        )
        .fillna({"c12": 0, "ctx1": 0, "c2": 0})
    )
    p = F.log(
        F.lit(lam)
        * ((F.col("c12") + F.lit(1)).cast("double")
           / (F.col("ctx1") + F.lit(v)).cast("double"))
        + F.lit(1.0 - lam)
        * ((F.col("c2") + F.lit(1)).cast("double")
           / F.lit(float(c_tot + v)))
    )
    agg = j.groupBy(id_col).agg(
        F.sum("cnt").alias("n_tokens"),
        F.sum((F.col("cnt") * p).cast(_DEC)).alias("s"),
    )
    scored = agg.select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(
            -(F.col("s").cast("double")) / F.col("n_tokens").cast("double"),
            6,
        ).alias("entropy"),
    ).withColumn("ppl", F.round(F.exp(F.col("entropy")), 6))
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .fillna({"n_tokens": 0})
    )
