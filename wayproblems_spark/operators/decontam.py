"""Benchmark decontamination: flag training documents that share any
n-gram with an evaluation/benchmark set (the standard pre-training
hygiene pass — GPT-3 used 13-gram overlap; the n is a knob because test
fixtures need shorter docs).

Shape: the BENCHMARK side is tokenized and reduced to its DISTINCT
n-gram strings once — benchmark suites are millions of grams at most, so
this side broadcasts (knob to disable for a pathological benchmark).
The corpus side explodes each document into its n-grams (linear blow-up:
len−n+1 grams/doc) and inner-joins the gram set; per-doc rollup counts
total and distinct hits. A LEFT join back onto the doc ids yields the
full per-document verdict frame, so downstream filters are a plain
``~contaminated``. One corpus-side shuffle (the per-doc rollup) when the
gram set broadcasts; no corpus×benchmark blow-up ever — the join is on
exact gram equality, never a cross product.

All-string gram equality (space-joined normalized tokens) means a SQL
engine reproduces the verdict exactly (q46). Hash the grams to longs
(xxhash64) when benchmark size makes broadcast of strings heavy —
``hash_grams=True`` keeps the same semantics modulo 64-bit collisions
(≈10⁻¹⁰ at 10⁶ grams) and is the 100 TB default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ranking import _toks


def _ngrams(frame: DataFrame, id_cols: list[str], n: int) -> DataFrame:
    """Explode a tokenized frame (``_t`` array column) into (id_cols...,
    gram) — one row per n-gram, gram = space-joined token window."""
    size = F.size("_t")
    idx = F.explode(F.sequence(F.lit(0), size - n)).alias("i")
    gram = F.concat_ws(
        " ", *[F.element_at("_t", F.col("i") + k + 1) for k in range(n)]
    )
    return (
        frame.filter(size >= n)
        .select(*id_cols, "_t", idx)
        .select(*id_cols, gram.alias("gram"))
    )


def ngram_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    broadcast_bench: bool = True,
    hash_grams: bool = False,
) -> DataFrame:
    """(id, n_hits, n_distinct_hit_grams, contaminated) for EVERY input
    document. ``n_hits`` counts corpus-side gram occurrences that appear
    anywhere in the benchmark; ``n_distinct_hit_grams`` counts distinct
    offending grams. Documents shorter than ``n`` tokens cannot be
    contaminated by construction."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    bench_toks = benchmark.select(_toks(F.col(bench_text_col)).alias("_t"))
    bench_grams = _ngrams(bench_toks, [], n).distinct()
    doc_toks = docs.select(F.col(id_col), _toks(F.col(text_col)).alias("_t"))
    doc_grams = _ngrams(doc_toks, [id_col], n)
    if hash_grams:
        bench_grams = bench_grams.select(F.xxhash64("gram").alias("gram"))
        doc_grams = doc_grams.select(id_col, F.xxhash64("gram").alias("gram"))
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    hits = (
        doc_grams.join(bench_grams, "gram")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_hits"),
            F.count_distinct("gram").alias("n_distinct_hit_grams"),
        )
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.coalesce("n_distinct_hit_grams", F.lit(0)).alias(
                "n_distinct_hit_grams"
            ),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )
