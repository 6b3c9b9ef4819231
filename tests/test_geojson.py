"""GeoJSON polygon source → engine polygon frame → G4/overlay consumers."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from wayproblems_spark.sources.geojson import read_geojson_polygons


def _sq(cx, cy, r):
    return [
        [cx - r, cy - r],
        [cx + r, cy - r],
        [cx + r, cy + r],
        [cx - r, cy + r],
        [cx - r, cy - r],
    ]


def _fixture() -> dict:
    return {
        "type": "FeatureCollection",
        "features": [
            {   # numeric id, hole, kind property
                "type": "Feature",
                "id": 7,
                "properties": {"kind": "admin"},
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [_sq(10.0, 10.0, 4.0), _sq(10.0, 10.0, 1.0)],
                },
            },
            {   # string-numeric id in properties
                "type": "Feature",
                "properties": {"id": "42", "kind": "landuse"},
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [_sq(30.0, 10.0, 2.0)],
                },
            },
            {   # no id at all -> stable hash id
                "type": "Feature",
                "properties": {"name": "anon"},
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [_sq(50.0, 10.0, 2.0)],
                },
            },
            {   # MultiPolygon -> two rows, packed part ids
                "type": "Feature",
                "id": 9,
                "properties": {"kind": "water"},
                "geometry": {
                    "type": "MultiPolygon",
                    "coordinates": [
                        [_sq(70.0, 10.0, 1.0)],
                        [_sq(75.0, 10.0, 1.0), _sq(75.0, 10.0, 0.25)],
                    ],
                },
            },
            {   # non-polygonal feature is skipped
                "type": "Feature",
                "id": 99,
                "properties": {"kind": "poi"},
                "geometry": {"type": "Point", "coordinates": [1.0, 2.0]},
            },
        ],
    }


def _write(tmp_path) -> str:
    p = tmp_path / "layer.geojson"
    p.write_text(json.dumps(_fixture()))
    return str(p)


MULTI9 = (1 << 62) | (9 << 12)  # MultiPolygon id 9, part 0 (disjoint range)


def test_read_geojson_polygons(spark, tmp_path):
    df = read_geojson_polygons(spark, _write(tmp_path))
    rows = {r["poly_id"]: r for r in df.collect()}
    # 7, 42, anon-hash, multi part 0, multi part 1 — the Point is gone
    assert len(rows) == 5
    assert 7 in rows and rows[7]["kind"] == "admin"
    assert len(rows[7]["holes"]) == 1
    assert 42 in rows and rows[42]["kind"] == "landuse"
    assert MULTI9 in rows and MULTI9 + 1 in rows
    assert rows[MULTI9 + 1]["holes"] and rows[MULTI9]["holes"] == []
    anon = [pid for pid in rows if pid not in (7, 42, MULTI9, MULTI9 + 1)]
    # hash-fallback Polygon ids are 61-bit: below the MultiPolygon range
    assert len(anon) == 1 and 0 <= anon[0] < (1 << 62)
    ring7 = rows[7]["ring"]
    assert ring7[0]["lon"] == 6.0 and ring7[0]["lat"] == 6.0


def test_geojson_ids_deterministic(spark, tmp_path):
    p = _write(tmp_path)
    a = sorted(r["poly_id"] for r in read_geojson_polygons(spark, p).collect())
    b = sorted(
        r["poly_id"]
        for r in read_geojson_polygons(spark, p).repartition(4).collect()
    )
    assert a == b


def test_geojson_feeds_point_in_polygon(spark, tmp_path):
    from wayproblems_spark.operators.pip import point_in_polygon

    polys = read_geojson_polygons(spark, _write(tmp_path))
    pts = spark.createDataFrame(
        [
            (0, 10.0, 12.0),   # inside 7's body (east of the hole)
            (1, 10.0, 10.0),   # inside 7's HOLE -> no hit
            (2, 10.0, 30.0),   # inside 42
            (3, 10.0, 75.5),   # inside MultiPolygon part 1 body (east of its hole)
            (4, 50.0, 50.0),   # nowhere
        ],
        "point_id long, lat double, lon double",
    )
    hits = {
        (r["point_id"], r["poly_id"])
        for r in point_in_polygon(spark, pts, polys, level=8).collect()
    }
    assert (0, 7) in hits
    assert not any(p == 1 for p, _ in hits)
    assert (2, 42) in hits
    assert (3, MULTI9 + 1) in hits
    assert not any(p == 4 for p, _ in hits)


def test_geojson_anonymous_multipolygon_and_bare_geometry(spark, tmp_path):
    """Regression: md5-fallback MultiPolygon ids must pack inside int64
    (was an Arrow OverflowError), and a bare-Geometry root document is a
    valid polygon layer, not a silent empty frame."""
    anon_multi = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"kind": "forest"},
                "geometry": {
                    "type": "MultiPolygon",
                    "coordinates": [[_sq(1.0, 1.0, 0.5)], [_sq(3.0, 1.0, 0.5)]],
                },
            }
        ],
    }
    p1 = tmp_path / "anon_multi.geojson"
    p1.write_text(json.dumps(anon_multi))
    rows = read_geojson_polygons(spark, str(p1)).collect()
    assert len(rows) == 2
    ids = sorted(r["poly_id"] for r in rows)
    assert all((1 << 62) <= i < (1 << 63) for i in ids)
    assert ids[1] == ids[0] + 1  # same base, successive parts

    bare = {"type": "Polygon", "coordinates": [_sq(5.0, 5.0, 1.0)]}
    p2 = tmp_path / "bare.geojson"
    p2.write_text(json.dumps(bare))
    rows2 = read_geojson_polygons(spark, str(p2)).collect()
    assert len(rows2) == 1 and rows2[0]["kind"] == "Polygon"
    assert 0 <= rows2[0]["poly_id"] < (1 << 62)


def test_geojson_out_of_range_id_raises(spark, tmp_path):
    import pytest

    bad = {
        "type": "Feature",
        "id": 1 << 55,  # too big for the 50-bit MultiPolygon base
        "properties": {},
        "geometry": {
            "type": "MultiPolygon",
            "coordinates": [[_sq(1.0, 1.0, 0.5)]],
        },
    }
    p = tmp_path / "bad.geojson"
    p.write_text(json.dumps(bad))
    with pytest.raises(Exception, match="packable range"):
        read_geojson_polygons(spark, str(p)).collect()
