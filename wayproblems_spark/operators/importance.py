"""Data-selection importance weights (DSIR-style): score each corpus
document by how much more likely its tokens are under a TARGET-domain
unigram LM than under the corpus's own unigram LM, then resample with
probability proportional to the (clipped) importance ratio. This is the
published hashed-ngram importance-resampling recipe (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling") reduced
to its unigram core — the piece that is pure relational algebra.

Weight definition (exactly reproducible cross-engine):

    w(doc) = Σ_term cnt(doc,term) · [ ln(tc+1) − ln(T+V)
                                    − ln(cc+1) + ln(C+V) ]

where tc/cc are the term's target/corpus counts, T/C the total token
counts, V the joint vocabulary size (add-one smoothing over the union
vocab). Every ln() is taken on an exact integer (same libm both
engines); the per-term products are accumulated through decimal(38,12)
so the sum is associative and partition-order-independent — the BM25
oracle's trick (ranking.py), which makes w bit-stable across
parallelism levels and SQL-replicable to 6 decimals.

Distributed shape: corpus term counts are one explode→map-side-partial
count (the vocab_topk scan); the per-(doc,term) frame joins the term
stat table on the term key — broadcast when the vocabulary is small
(default), shuffle otherwise; T/C/V are three collected scalars folded
into the plan as literals (the BM25 corpus-stats stance). One shuffle
for the per-doc rollup. Nothing quadratic anywhere.

``importance_sample`` keeps documents via the engine's frozen-md5 draw
(sampling.py) against min(1, exp(w − ln_z)) — selection is a pure row
function of (id, w), so re-runs and appends agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ranking import _toks
from .sampling import _DENOM, _hash_u32

_DEC = "decimal(38,12)"


def _term_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """(term, n) across the frame — one explode, map-side partials."""
    return (
        docs.select(F.explode(_toks(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_text_col: str = "text",
    broadcast_stats: bool = True,
) -> DataFrame:
    """(id, weight) — the log importance ratio above, rounded to 6
    decimals. Positive ⇒ the doc looks more target-like than
    corpus-like. Docs with zero tokens get no row."""
    corpus_tc = _term_counts(docs, text_col)
    target_tc = _term_counts(target, target_text_col)

    # Joint vocab with both counts; absent side = 0 (add-one smoothing
    # keeps every term finite). outer join is vocab-sized, not corpus-sized.
    stats = (
        corpus_tc.withColumnRenamed("n", "cc")
        .join(target_tc.withColumnRenamed("n", "tc"), "term", "full")
        .select(
            "term",
            F.coalesce("cc", F.lit(0)).alias("cc"),
            F.coalesce("tc", F.lit(0)).alias("tc"),
        )
    )
    totals = stats.agg(
        F.sum("cc").alias("c"), F.sum("tc").alias("t"), F.count("*").alias("v")
    ).collect()[0]
    c_tot, t_tot, v = int(totals["c"]), int(totals["t"]), int(totals["v"])

    # per-term log factor: ln on exact integers only (libm-identical in
    # any engine); the two totals fold in as plan literals
    factor = (
        F.log(F.col("tc") + 1)
        - F.log(F.lit(float(t_tot + v)))
        - F.log(F.col("cc") + 1)
        + F.log(F.lit(float(c_tot + v)))
    )
    stats = stats.select("term", factor.alias("f"))
    if broadcast_stats:
        stats = F.broadcast(stats)

    per_doc_term = (
        docs.select(F.col(id_col), F.explode(_toks(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        per_doc_term.join(stats, "term")
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum((F.col("cnt") * F.col("f")).cast(_DEC)).cast("double"),
                6,
            ).alias("weight")
        )
    )


def importance_sample(
    docs: DataFrame,
    target: DataFrame,
    ln_z: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "dsir",
) -> DataFrame:
    """Keep each doc with probability min(1, exp(weight − ln_z)) using
    the frozen md5 draw — deterministic, repartition/append-stable.
    ``ln_z`` shifts the acceptance scale (raise it to keep fewer, most
    target-like docs). Returns the kept docs with their weight column."""
    w = dsir_weights(docs, target, id_col=id_col, text_col=text_col)
    keep_p = F.least(F.lit(1.0), F.exp(F.col("weight") - ln_z))
    kept = w.filter(
        _hash_u32(F.col(id_col), salt) < (keep_p * _DENOM).cast("long")
    )
    return docs.join(kept, id_col)
