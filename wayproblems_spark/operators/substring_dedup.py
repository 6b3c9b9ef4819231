"""Exact-substring dedup — repeated token spans of length ≥ k.

The "Deduplicating Training Data Makes Language Models Better"
(Lee et al., 2022) exact-substring technique, recast from its
suffix-array formulation into the equivalent k-gram-seed form a shuffle
engine executes well: a token position is COVERED iff the k-gram
starting there occurs at ≥2 distinct (doc, pos) sites corpus-wide
(self-repeats inside one document count — two sites are two sites);
the union of covered k-windows, merged into maximal intervals, is
exactly the set of substrings of length ≥ k that appear ≥2 times.

Physical plan:
  1. tokenize once (the q32-locked whitespace split), posexplode the
     n−k+1 gram starts, gram = space-joined `slice` — all codegen.
  2. duplicate gram set = ONE groupBy(gram).count() HAVING ≥2 with
     map-side partial counts; `hash_grams=True` swaps the string key
     for xxhash64 at 100 TB (64-bit collisions ≈ n²/2⁶⁵ — document,
     don't default; the decontam.py stance).
  3. covered positions join back (gram-keyed), then per-doc maximal
     intervals via the gaps-and-islands window: same-length windows
     [pos, pos+k) merge iff successive starts differ ≤ k, so island id
     = running sum of (pos − lag(pos) > k). The window partitions by
     doc_id — no global ordering, no single-partition stage.
  4. `strip_repeated_spans` rebuilds each doc from the tokens outside
     all covered intervals (the paper's "drop one occurrence" variants
     can be layered on the span frame; stripping every covered span is
     the deterministic, order-free choice).

Scale: the gram explosion is ~tokens/doc rows wide but never leaves the
scan stage before its partial count; the only wide shuffles are the
gram count and the covered-position join, both on high-cardinality
uniform keys (AQE-splittable). The boilerplate hot gram collapses to
one row per map task in the partial aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["repeated_spans", "strip_repeated_spans"]

_TOKEN_SPLIT = r"\s+"


def _grams(docs: DataFrame, k: int, id_col: str, text_col: str) -> DataFrame:
    toks = F.split(F.trim(F.col(text_col)), _TOKEN_SPLIT)
    base = docs.select(
        F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_n")
    ).filter(F.col("_n") >= k)
    return base.select(
        id_col,
        F.posexplode(F.sequence(F.lit(0), F.col("_n") - k)).alias("_i", "pos"),
        F.col("_toks"),
    ).select(
        id_col,
        "pos",
        F.concat_ws(" ", F.slice(F.col("_toks"), F.col("pos") + 1, k)).alias("gram"),
    )


def repeated_spans(
    docs: DataFrame,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = False,
) -> DataFrame:
    """(id, span_start, span_end) — the union of all token windows
    [i, i+k) whose k-gram occurs ≥2 times corpus-wide, merged into
    maximal intervals (after a gap == k merge, interior windows of the
    merged interval need not themselves be duplicated — see the module
    docstring). Documents with no repeated span are absent. ``hash_grams=True`` keys the
    duplicate-detection shuffle by xxhash64(gram) instead of the gram
    string (64-bit collision risk accepted for corpus scale)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    grams = _grams(docs, k, id_col, text_col)
    if hash_grams:
        grams = grams.select(id_col, "pos", F.xxhash64("gram").alias("gram"))
    dup = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("_cnt")).filter(
        F.col("_cnt") >= 2
    )
    covered = grams.join(dup.select("gram"), "gram").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = covered.withColumn(
        "_brk",
        F.when(
            F.col("pos") - F.lag("pos").over(w) > k, F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn("_island", F.sum("_brk").over(w))
    return islands.groupBy(id_col, "_island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + k).alias("span_end"),
    ).select(id_col, "span_start", "span_end")


def strip_repeated_spans(
    docs: DataFrame,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = False,
    spans: DataFrame | None = None,
) -> DataFrame:
    """Rebuild each document from the tokens OUTSIDE every repeated span
    (space-joined; token-level — original inter-token whitespace is not
    preserved, matching the tokenize-once contract). Docs that are one
    big repeated span come back with empty text. Pass a precomputed
    ``spans=`` frame (from :func:`repeated_spans`) to avoid recomputing
    when both outputs are needed."""
    if spans is None:
        spans = repeated_spans(docs, k, id_col, text_col, hash_grams)
    agg_spans = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    toks = F.split(F.trim(F.col(text_col)), _TOKEN_SPLIT)
    joined = docs.join(agg_spans, id_col, "left")
    # Higher-order array exprs are interpreted, not codegen (the engine
    # perf law) — acceptable HERE because multiplicity is tokens ×
    # spans-per-doc with a small span count, and the corpus-wide heavy
    # lifting (gram count + covered join) already ran codegen-side in
    # repeated_spans. Rebuilding strings is concat-bound anyway.
    indexed = F.transform(
        F.col("_t"), lambda t, i: F.struct(t.alias("t"), i.alias("p"))
    )
    kept = F.filter(
        indexed,
        lambda e: ~F.exists(
            F.col("_spans"),
            lambda s: (e["p"] >= s["span_start"]) & (e["p"] < s["span_end"]),
        ),
    )
    out = (
        joined.withColumn("_t", toks)
        .withColumn(
            text_col,
            F.when(F.col("_spans").isNull(), F.col(text_col)).otherwise(
                F.concat_ws(" ", F.transform(kept, lambda e: e["t"]))
            ),
        )
        .drop("_t", "_spans")
    )
    return out
