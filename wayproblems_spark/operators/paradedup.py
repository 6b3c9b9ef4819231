"""Paragraph-level exact deduplication (the CCNet pre-processing pass):
boilerplate paragraphs — cookie banners, navigation, license blocks —
repeat across millions of pages; remove every repeated paragraph except
its FIRST occurrence in corpus order, then stitch each document back
together from its surviving paragraphs.

Contract (exact, engine-replicable):
* paragraphs = ``split(text, sep)``, empty strings dropped, position
  within the document retained;
* the canonical occurrence of a paragraph string is the lexicographic
  minimum of (doc_id, position) over ALL its occurrences (within-doc
  repeats collapse to the earliest position too);
* output text = surviving paragraphs re-joined by ``sep`` in original
  order; a document whose every paragraph was seen earlier comes back
  as the empty string (kept as a row — dropping is the caller's filter).

Distributed shape: one posexplode (linear), ONE shuffle keyed on the
paragraph string to find the minimum (map-side partial min(struct)),
an equality join back (paragraph key again — same partitioning, AQE
reuses it), and one doc-keyed rollup to reassemble. The paragraph key
is skew-prone by construction (THE boilerplate string is the hottest
key) — but the per-key state is a single (doc_id, pos) min, which
map-side partials reduce before the shuffle, so the hot key ships one
row per map task, not one per occurrence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_paragraphs(
    docs: DataFrame,
    sep: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, text, n_paras, n_kept) — see module docstring."""
    paras = (
        docs.select(
            F.col(id_col),
            # split() takes a REGEX — \Q..\E quotes sep so '.' or '|'
            # separators split literally
            F.posexplode(
                F.split(F.col(text_col), "\\Q" + sep + "\\E")
            ).alias("pos", "para"),
        )
        .filter(F.col("para") != "")
    )
    first = paras.groupBy("para").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_f")
    )
    kept = paras.join(first, "para").filter(
        (F.col(id_col) == F.col(f"_f.{id_col}"))
        & (F.col("pos") == F.col("_f.pos"))
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            sep,
        ).alias("text"),
        F.count("*").alias("n_kept"),
    )
    totals = paras.groupBy(id_col).agg(F.count("*").alias("n_paras"))
    return (
        docs.select(id_col)
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("text", F.lit("")).alias("text"),
            F.coalesce("n_paras", F.lit(0)).alias("n_paras"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )
