"""Flagship end-to-end pipeline: pages → extract → geoparse → resolve →
rule engine → spatial ops → tiles (EP1 lifecycle, SURVEY.md §3).

Stage/shuffle map at scale (SURVEY.md §3):
  scan pages → G1/G2 extraction+parse (narrow, Arrow UDF only for text)
  → shuffle 1: node-resolution join (P3)
  → narrow rule projection (P6, whole-stage codegen)
  → shuffle 2: spatial joins (PIP broadcast — usually no shuffle; kNN cells)
  → shuffle 3: tile groupBy (G6)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fixtures.pages import generate_corpus, pages_df
from .operators.knn import knn_nearest_way
from .operators.pip import point_in_polygon
from .operators.resolve import drop_invalid_geometry, resolve_locations
from .operators.tiles import tile_counts
from .rules import problems
from .sources.pages_source import (
    nodes_from_pages,
    polys_from_pages,
    ways_from_pages,
)


def corpus_frames(spark: SparkSession, n_pages: int, seed: int, split: str):
    """Deterministic corpus → (pages, ways, nodes, polys) DataFrames."""
    corpus = generate_corpus(n_pages=n_pages, seed=seed, split=split)
    pdf = pages_df(spark, corpus)
    return (
        pdf,
        ways_from_pages(pdf).drop("src_url"),
        nodes_from_pages(pdf),
        polys_from_pages(pdf),
    )


def wayproblems_from_pages(
    pages: DataFrame, broadcast_nodes: bool = True
) -> DataFrame:
    """pages → flagged problems with geometry."""
    ways = ways_from_pages(pages).drop("src_url")
    nodes = nodes_from_pages(pages)
    resolved = drop_invalid_geometry(
        resolve_locations(ways, nodes, broadcast_nodes=broadcast_nodes)
    )
    return problems(resolved)


def full_pipeline(
    spark: SparkSession,
    n_pages: int = 400,
    seed: int = 42,
    split: str = "unit",
    tile_z: int = 12,
    knn_level: int = 12,
) -> dict[str, DataFrame]:
    """All products: problems, tiles, knn assignment, pip assignment."""
    pages, ways, nodes, polys = corpus_frames(spark, n_pages, seed, split)
    resolved = drop_invalid_geometry(resolve_locations(ways, nodes, broadcast_nodes=True))
    probs = problems(resolved)
    tiles = tile_counts(probs, tile_z)
    pts = nodes.select(F.col("node_id").alias("point_id"), "lat", "lon")
    knn = knn_nearest_way(pts, resolved, level=knn_level)
    pip = point_in_polygon(spark, pts, polys, level=10)
    return {
        "pages": pages,
        "resolved": resolved,
        "problems": probs,
        "tiles": tiles,
        "knn": knn,
        "pip": pip,
    }
