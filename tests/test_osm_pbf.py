"""OSM PBF ingest: encoder→decoder round-trip oracle + end-to-end rule run
from a synthesized .osm.pbf (the reference's Geofabrik workflow shape,
README.mdwn:23-28)."""

from __future__ import annotations

import datetime

import numpy as np
from pyspark.sql import functions as F

from wayproblems_spark.operators.resolve import (
    drop_invalid_geometry,
    resolve_locations,
)
from wayproblems_spark.rules import problems
from wayproblems_spark.sources.osm_pbf import (
    decode_packed_varints,
    pbf_nodes,
    pbf_to_parquet,
    pbf_ways,
    scan_blob_index,
    write_pbf,
)

TS = 1767225600  # 2026-01-01T00:00:00Z


def _fixture_pbf(path):
    nodes = [
        (101, 51.0, 8.0),
        (102, 51.001, 8.001),
        (103, 51.002, 8.002),
        (104, -35.2, -120.5),
    ]
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
            "tags": {"highway": "footway", "footway": "sidewalk"},
            "version": 1,
            "changeset": 1000,
            "uid": 43,
            "user": "zwei",
            "ts_epoch_s": TS + 60,
        },
    ]
    write_pbf(str(path), nodes, ways)
    return nodes, ways


def test_packed_varint_vectorized_decoder():
    from wayproblems_spark.sources.osm_pbf import _enc_varint

    rng = np.random.default_rng(1)
    vals = [int(v) for v in rng.integers(0, 2**62, 500)] + [0, 1, 127, 128, 2**62]
    buf = b"".join(_enc_varint(v) for v in vals)
    got = decode_packed_varints(buf)
    assert got.tolist() == [v for v in vals]


def test_pbf_roundtrip(spark, tmp_path):
    pbf = tmp_path / "fixture.osm.pbf"
    nodes, ways = _fixture_pbf(pbf)

    idx = scan_blob_index(str(pbf))
    assert [b["type"] for b in idx] == ["OSMHeader", "OSMData"]

    got_nodes = {
        r["node_id"]: (r["lat"], r["lon"]) for r in pbf_nodes(spark, str(pbf)).collect()
    }
    assert set(got_nodes) == {101, 102, 103, 104}
    for nid, la, lo in nodes:
        assert abs(got_nodes[nid][0] - la) < 1e-7
        assert abs(got_nodes[nid][1] - lo) < 1e-7

    got_ways = {r["way_id"]: r.asDict() for r in pbf_ways(spark, str(pbf)).collect()}
    assert set(got_ways) == {7, 8}
    w7 = got_ways[7]
    assert w7["nodes"] == [101, 102, 103]
    assert w7["tags"] == {"highway": "residential", "layer": "abc"}
    assert w7["version"] == 3 and w7["changeset"] == 999 and w7["uid"] == 42
    assert w7["user"] == "mapper one"
    assert w7["ts"] == datetime.datetime(2026, 1, 1, 0, 0, 0)
    assert got_ways[8]["nodes"] == [103, 101]


def test_pbf_to_parquet_and_rule_engine_e2e(spark, tmp_path):
    pbf = tmp_path / "fixture.osm.pbf"
    _fixture_pbf(pbf)
    counts = pbf_to_parquet(spark, str(pbf), str(tmp_path / "out"))
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


def test_packed_field_split_across_occurrences():
    """Protobuf permits one packed repeated field to arrive as several
    length-delimited occurrences; the decoder must concatenate them
    (round-2 ADVICE: reading only [0] silently dropped ids/refs)."""
    from wayproblems_spark.sources.osm_pbf import (
        _enc_varint,
        _enc_zig,
        _field,
        decode_primitive_block,
    )

    def ld(num, payload):
        return _field(num, 2) + _enc_varint(len(payload)) + payload

    deltas = [101, 1, 1]  # ids 101,102,103 delta-coded
    lat_d = [510000000, 1000, 1000]
    lon_d = [80000000, 1000, 1000]

    def packed_split(num, vals):
        # split one packed field into TWO occurrences
        a = b"".join(_enc_zig(v) for v in vals[:1])
        b = b"".join(_enc_zig(v) for v in vals[1:])
        return ld(num, a) + ld(num, b)

    dense = packed_split(1, deltas) + packed_split(8, lat_d) + packed_split(9, lon_d)
    group = ld(2, dense)
    stringtable = ld(1, ld(1, b""))
    block = stringtable + ld(2, group)
    out = decode_primitive_block(block)
    assert out["nodes"]["node_id"].tolist() == [101, 102, 103]
    # lat = 1e-9 * granularity(100) * cumsum(delta)
    np.testing.assert_allclose(out["nodes"]["lat"].tolist(), [51.0, 51.0001, 51.0002])


def test_truncated_packed_varint_raises():
    from wayproblems_spark.sources.osm_pbf import _enc_varint
    import pytest

    buf = _enc_varint(300) + b"\x96"  # final byte has continuation bit set
    with pytest.raises(ValueError, match="truncated"):
        decode_packed_varints(buf)
