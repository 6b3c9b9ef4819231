"""End-to-end parity: pages → extraction → geoparse → resolve → rules,
checked against generator ground truth + the pure-Python oracle
(SURVEY.md §5.2.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wayproblems_spark.fixtures.pages import generate_corpus, pages_df
from wayproblems_spark.operators.resolve import drop_invalid_geometry, resolve_locations
from wayproblems_spark.rules import problems, way_problems
from wayproblems_spark.sources.pages_source import (
    nodes_from_pages,
    polys_from_pages,
    verify_extraction,
    ways_from_pages,
)


def test_extraction_byte_identical(spark):
    corpus = generate_corpus(n_pages=300, seed=7, split="unit")
    pdf = pages_df(spark, corpus)
    assert verify_extraction(pdf) == 0


def test_geoparse_roundtrip(spark):
    corpus = generate_corpus(n_pages=300, seed=7, split="unit")
    pdf = pages_df(spark, corpus)

    ways = {r["way_id"]: r for r in ways_from_pages(pdf).collect()}
    assert len(ways) == len(corpus["ways"])
    for wid, ver, cs, uid, user, ts, refs, tags in corpus["ways"]:
        w = ways[wid]
        assert w["version"] == ver and w["changeset"] == cs and w["uid"] == uid
        assert w["user"] == user and w["ts"] == ts
        assert w["nodes"] == refs
        assert dict(w["tags"]) == tags

    nodes = {r["node_id"]: r for r in nodes_from_pages(pdf).collect()}
    assert len(nodes) == len(corpus["nodes"])
    for nid, lat, lon in corpus["nodes"]:
        assert nodes[nid]["lat"] == lat and nodes[nid]["lon"] == lon

    polys = {r["poly_id"]: r for r in polys_from_pages(pdf).collect()}
    assert len(polys) == len(corpus["polys"])
    for pid, kind, ring in corpus["polys"]:
        p = polys[pid]
        assert p["kind"] == kind
        assert [(v["lon"], v["lat"]) for v in p["ring"]] == ring


def test_resolve_and_rules_match_oracle(spark):
    corpus = generate_corpus(n_pages=400, seed=11, split="e2e")
    pdf = pages_df(spark, corpus)
    ways = ways_from_pages(pdf).drop("src_url")
    nodes = nodes_from_pages(pdf)

    resolved = drop_invalid_geometry(resolve_locations(ways, nodes, broadcast_nodes=True))
    out = problems(resolved).collect()
    got = sorted(
        (r.way_id, r.site, r.sub, r.layer, r.style, r.problem) for r in out
    )

    node_ids = {n[0] for n in corpus["nodes"]}
    exp = []
    for wid, ver, cs, uid, user, ts, refs, tags in corpus["ways"]:
        resolved_pts = [r for r in refs if r in node_ids]
        if len(resolved_pts) < 2:
            continue  # create_linestring throws; feature skipped (cpp:124-127)
        w = {"tags": tags, "closed": len(refs) > 0 and refs[0] == refs[-1]}
        for e in way_problems(w):
            exp.append((wid, e["site"], e["sub"], e["layer"], e["style"], e["problem"]))
    exp.sort()
    assert got == exp
    assert len(got) > 50  # the corpus must actually exercise the catalogue


def test_geometry_drops_dangling_refs(spark):
    corpus = generate_corpus(n_pages=200, seed=13, split="unit")
    pdf = pages_df(spark, corpus)
    ways = ways_from_pages(pdf).drop("src_url")
    nodes = nodes_from_pages(pdf)
    resolved = resolve_locations(ways, nodes, broadcast_nodes=True)

    node_ids = {n[0] for n in corpus["nodes"]}
    sizes = {r["way_id"]: r["n"] for r in resolved.select("way_id", F.size("geom").alias("n")).collect()}
    for wid, _, _, _, _, _, refs, _ in corpus["ways"]:
        assert sizes[wid] == len([r for r in refs if r in node_ids])
