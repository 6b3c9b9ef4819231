"""OSM XML ingest (reference parity: osmium::io::File opens .osm.xml,
wayproblems.cpp:21): writer→reader round-trip oracle, byte-range split
correctness, and an end-to-end rule run from XML."""

from __future__ import annotations

import datetime

from wayproblems_spark.operators.resolve import (
    drop_invalid_geometry,
    resolve_locations,
)
from wayproblems_spark.rules import problems
from wayproblems_spark.sources.osm_xml import (
    write_osm_xml,
    xml_nodes,
    xml_to_parquet,
    xml_ways,
)

TS = 1767225600  # 2026-01-01T00:00:00Z


def _fixture_xml(path, n_extra_nodes=0):
    nodes = [
        (101, 51.0, 8.0),
        (102, 51.001, 8.001),
        (103, 51.002, 8.002),
        (104, -35.2, -120.5),
    ] + [(1000 + i, 50.0 + i * 1e-4, 7.0 + i * 1e-4) for i in range(n_extra_nodes)]
    ways = [
        {
            "id": 7,
            "refs": [101, 102, 103],
            "tags": {"highway": "residential", "layer": "abc"},
            "version": 3,
            "changeset": 999,
            "uid": 42,
            "user": "mapper one",
            "ts_epoch_s": TS,
        },
        {
            "id": 8,
            "refs": [103, 101],
            # XML entity escaping must round-trip (the reason ways go
            # through a real XML parse, not regex)
            "tags": {"highway": "footway", "note": 'a<b & "q"'},
            "version": 1,
            "changeset": 1000,
            "uid": 43,
            "user": "zw&ei",
            "ts_epoch_s": TS + 60,
        },
    ]
    write_osm_xml(str(path), nodes, ways)
    return nodes, ways


def test_xml_roundtrip(spark, tmp_path):
    xml = tmp_path / "fixture.osm.xml"
    nodes, _ = _fixture_xml(xml)

    got_nodes = {
        r["node_id"]: (r["lat"], r["lon"]) for r in xml_nodes(spark, str(xml)).collect()
    }
    assert set(got_nodes) == {101, 102, 103, 104}
    for nid, la, lo in nodes:
        assert abs(got_nodes[nid][0] - la) < 1e-9
        assert abs(got_nodes[nid][1] - lo) < 1e-9

    got_ways = {r["way_id"]: r.asDict() for r in xml_ways(spark, str(xml)).collect()}
    assert set(got_ways) == {7, 8}
    w7 = got_ways[7]
    assert w7["nodes"] == [101, 102, 103]
    assert w7["tags"] == {"highway": "residential", "layer": "abc"}
    assert w7["version"] == 3 and w7["changeset"] == 999 and w7["uid"] == 42
    assert w7["user"] == "mapper one"
    assert w7["ts"] == datetime.datetime(2026, 1, 1, 0, 0, 0)
    w8 = got_ways[8]
    assert w8["tags"]["note"] == 'a<b & "q"'
    assert w8["user"] == "zw&ei"


def test_xml_split_ranges_lossless(spark, tmp_path):
    """Tiny chunk_bytes forces range boundaries through the middle of
    elements: each element must be decoded by exactly one range (start
    in-range; completion from the overrun)."""
    xml = tmp_path / "big.osm.xml"
    nodes, ways = _fixture_xml(xml, n_extra_nodes=500)

    got = xml_nodes(spark, str(xml), chunk_bytes=512).toPandas()
    assert sorted(got["node_id"].tolist()) == sorted(n[0] for n in nodes)
    got_w = xml_ways(spark, str(xml), chunk_bytes=512).toPandas()
    assert sorted(got_w["way_id"].tolist()) == [7, 8]
    assert list(got_w.set_index("way_id").loc[7, "nodes"]) == [101, 102, 103]


def test_xml_to_parquet_and_rule_engine_e2e(spark, tmp_path):
    xml = tmp_path / "fixture.osm.xml"
    _fixture_xml(xml)
    counts = xml_to_parquet(spark, str(xml), str(tmp_path / "out"))
    assert counts == {"ways": 2, "nodes": 4}

    ways = spark.read.parquet(str(tmp_path / "out" / "ways"))
    nodes = spark.read.parquet(str(tmp_path / "out" / "nodes"))
    resolved = drop_invalid_geometry(resolve_locations(ways, nodes))
    probs = problems(resolved)
    rows = probs.select("way_id", "problem").collect()
    # way 7 carries layer=abc → the tag_layer "not integer" emission fires
    assert any(
        r["way_id"] == 7 and "layer=abc is not integer" in r["problem"] for r in rows
    )


def test_xml_gt_in_attribute_values(spark, tmp_path):
    """A raw '>' (or '/>') inside a double-quoted attribute value is legal
    XML (only '<' and '&' must be escaped); the quote-aware sweeps must
    parse such nodes/ways instead of raising a count mismatch (ADVICE r3)."""
    xml = tmp_path / "gt.osm.xml"
    with open(xml, "wb") as f:
        f.write(b'<?xml version="1.0" encoding="UTF-8"?>\n<osm version="0.6">\n')
        # user attr with '>' BEFORE id/lat/lon — the old [^>]*? sweep
        # stopped here and missed the id
        f.write(b'  <node user="a>b" id="201" lat="50.5" lon="7.5" version="1"/>\n')
        f.write(b'  <node id="202" lat="50.6" lon="7.6" version="1"/>\n')
        # way attr value containing "/>" — the old self-closing branch
        # truncated the element here
        f.write(b'  <way id="9" version="1" timestamp="2020-01-01T00:00:00Z" '
                b'changeset="1" uid="1" user="x/>y">\n')
        f.write(b'    <nd ref="201"/>\n    <nd ref="202"/>\n')
        f.write(b'    <tag k="highway" v="track"/>\n  </way>\n</osm>\n')
    nodes = {r["node_id"]: (r["lat"], r["lon"]) for r in xml_nodes(spark, str(xml)).collect()}
    assert nodes == {201: (50.5, 7.5), 202: (50.6, 7.6)}
    ways = xml_ways(spark, str(xml)).collect()
    assert len(ways) == 1 and ways[0]["user"] == "x/>y" and ways[0]["nodes"] == [201, 202]
