"""jobs/spatial_stats.py CLI smoke: assignments + zonal + overlay."""

from __future__ import annotations

import json
import os
import sys

from tests.test_geojson import _fixture, _sq, MULTI9

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs")
)


def test_spatial_stats_job(spark, tmp_path):
    from spatial_stats import main

    layer_a = tmp_path / "a.geojson"
    layer_a.write_text(json.dumps(_fixture()))
    # second layer: one square overlapping feature 7's body, one far away
    layer_b = tmp_path / "b.geojson"
    layer_b.write_text(
        json.dumps(
            {
                "type": "FeatureCollection",
                "features": [
                    {
                        "type": "Feature",
                        "id": 500,
                        "properties": {"kind": "zone"},
                        "geometry": {
                            "type": "Polygon",
                            "coordinates": [_sq(13.0, 10.0, 2.0)],
                        },
                    },
                    {
                        "type": "Feature",
                        "id": 501,
                        "properties": {"kind": "zone"},
                        "geometry": {
                            "type": "Polygon",
                            "coordinates": [_sq(90.0, 40.0, 1.0)],
                        },
                    },
                ],
            }
        )
    )
    pts = spark.createDataFrame(
        [
            (0, 10.0, 12.0, 4.0),    # inside 7 (east of hole)
            (1, 10.0, 10.0, 2.0),    # inside 7's hole -> unassigned
            (2, 10.5, 12.5, 6.0),    # inside 7
            (3, 10.0, 30.0, 10.0),   # inside 42
            (4, 10.0, 75.5, 1.0),    # inside MultiPolygon part 1
            (5, 50.0, 50.0, 99.0),   # nowhere
        ],
        "point_id long, lat double, lon double, score double",
    )
    pts_path = str(tmp_path / "pts_parquet")
    pts.write.parquet(pts_path)
    out = str(tmp_path / "out")

    rc = main(
        [
            "--points", pts_path,
            "--layer", str(layer_a),
            "--layer-b", str(layer_b),
            "--out", out,
            "--level", "8",
            "--value-cols", "score",
        ]
    )
    assert rc == 0
    stats = json.loads((tmp_path / "out" / "stats.json").read_text())
    assert stats["assignments"] == 4 and stats["zonal"] == 3

    zon = {
        r["poly_id"]: r
        for r in spark.read.parquet(os.path.join(out, "zonal")).collect()
    }
    assert zon[7]["n_points"] == 2 and float(zon[7]["score_sum"]) == 10.0
    assert zon[7]["score_avg"] == 5.0
    assert zon[42]["n_points"] == 1 and zon[MULTI9 + 1]["n_points"] == 1

    over = {
        (r["a_id"], r["b_id"])
        for r in spark.read.parquet(os.path.join(out, "overlay")).collect()
    }
    # zone 500 ([11,15]x[8,12]) overlaps feature 7 ([6,14]^2); 501 nothing
    assert over == {(7, 500)}
    assert stats["overlay"] == 1
