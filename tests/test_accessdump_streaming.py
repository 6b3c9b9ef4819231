"""P9 access-combination dump + Structured Streaming pipeline parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from wayproblems_spark.fixtures.pages import generate_corpus, pages_df
from wayproblems_spark.operators.accessdump import access_combinations, combination_histogram
from wayproblems_spark.operators.resolve import drop_invalid_geometry, resolve_locations
from wayproblems_spark.rules import problems
from wayproblems_spark.sources.pages_source import nodes_from_pages, ways_from_pages
from wayproblems_spark.streaming.pipeline import (
    read_pages_stream,
    run_to_sink,
    streaming_problems,
)

from .conftest import mk_way, ways_df


def test_access_combinations_format(spark):
    rows = [
        mk_way(1, {"highway": "residential", "access": "private", "foot": "yes"}),
        mk_way(2, {"highway": "track"}),
        mk_way(3, {"railway": "rail"}),  # no highway → skipped
        mk_way(4, {"highway": "path", "horse": "no", "bicycle": "yes"}),
    ]
    got = {r["way_id"]: r["line"] for r in access_combinations(ways_df(spark, rows)).collect()}
    # key order is the fixed C++ dump order (accesscombinations.cpp:38-41)
    assert got == {
        1: "highway=residential access=private foot=yes ",
        2: "highway=track ",
        4: "highway=path bicycle=yes horse=no ",
    }
    with_id = {r["way_id"]: r["line"] for r in access_combinations(ways_df(spark, rows), with_wayid=True).collect()}
    assert with_id[2] == "2 highway=track "

    hist = combination_histogram(ways_df(spark, rows)).collect()
    assert hist[0]["n"] >= hist[-1]["n"]


def test_streaming_matches_batch(spark, tmp_path):
    corpus = generate_corpus(n_pages=120, seed=9, split="unit")
    pdf = pages_df(spark, corpus)
    pages_path = str(tmp_path / "pages")
    # multiple files → multiple stream triggers with maxFilesPerTrigger
    pdf.repartition(6).write.parquet(pages_path)

    static_pages = spark.read.parquet(pages_path)
    nodes = nodes_from_pages(static_pages)

    # batch reference
    ways = ways_from_pages(static_pages).drop("src_url")
    resolved = drop_invalid_geometry(resolve_locations(ways, nodes, broadcast_nodes=True))
    batch = sorted(
        (r.way_id, r.site, r.sub, r.layer, r.problem)
        for r in problems(resolved).collect()
    )

    # streaming run, availableNow
    stream = read_pages_stream(spark, pages_path, max_files=2)
    out = streaming_problems(stream, nodes)
    q = run_to_sink(
        out.select("way_id", "site", "sub", "layer", "problem"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)
    got = sorted(
        (r.way_id, r.site, r.sub, r.layer, r.problem)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert got == batch and len(got) > 10
