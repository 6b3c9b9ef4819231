"""Geometry measures (length/area) vs numpy oracles."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from wayproblems_spark.operators.geometry import ring_area_m2, way_length_m
from wayproblems_spark.operators.knn import EARTH_RADIUS_M


def _hav(a, b):
    (ax, ay), (bx, by) = a, b
    dphi = math.radians(by - ay) / 2
    dlam = math.radians(bx - ax) / 2
    h = math.sin(dphi) ** 2 + math.cos(math.radians(ay)) * math.cos(
        math.radians(by)
    ) * math.sin(dlam) ** 2
    return 2 * EARTH_RADIUS_M * math.asin(math.sqrt(h))


def test_way_length_vs_numpy(spark):
    rng = np.random.RandomState(4)
    rows, exp = [], {}
    for wid in range(60):
        k = rng.randint(1, 6)
        lon0, lat0 = rng.uniform(-170, 170), rng.uniform(-60, 60)
        pts = [
            (float(lon0 + 0.01 * i + 0.001 * rng.rand()), float(lat0 + 0.008 * i))
            for i in range(k)
        ]
        rows.append((wid, [{"lon": p[0], "lat": p[1]} for p in pts]))
        exp[wid] = sum(_hav(pts[i], pts[i + 1]) for i in range(k - 1))
    df = spark.createDataFrame(
        rows, "way_id long, geom array<struct<lon:double,lat:double>>"
    )
    got = {r["way_id"]: r["length_m"] for r in way_length_m(df).collect()}
    assert set(got) == set(exp)
    for wid, e in exp.items():
        assert abs(got[wid] - e) < 1e-6, (wid, got[wid], e)


def test_ring_area_vs_numpy(spark):
    rng = np.random.RandomState(9)
    rows, exp = [], {}
    k_m = math.pi / 180.0 * EARTH_RADIUS_M
    for pid in range(40):
        n = rng.randint(3, 8)
        lon0, lat0 = rng.uniform(-170, 170), rng.uniform(-60, 60)
        ang = np.sort(rng.uniform(0, 2 * math.pi, n))
        r = rng.uniform(0.05, 0.3, n)
        pts = [
            (float(lon0 + r[i] * math.cos(ang[i])), float(lat0 + r[i] * math.sin(ang[i])))
            for i in range(n)
        ]
        pts.append(pts[0])
        rows.append((pid, [{"lon": p[0], "lat": p[1]} for p in pts]))
        mean_lat = sum(p[1] for p in pts[:-1]) / n
        c = math.cos(math.radians(mean_lat))
        area = 0.0
        for i in range(n):
            ax, ay = pts[i][0] * c * k_m, pts[i][1] * k_m
            bx, by = pts[i + 1][0] * c * k_m, pts[i + 1][1] * k_m
            area += ax * by - bx * ay
        exp[pid] = abs(area) / 2.0
    df = spark.createDataFrame(
        rows, "poly_id long, ring array<struct<lon:double,lat:double>>"
    )
    got = {r["poly_id"]: r["area_m2"] for r in ring_area_m2(df).collect()}
    assert set(got) == set(exp)
    for pid, e in exp.items():
        assert abs(got[pid] - e) < max(1e-4, 1e-9 * e), (pid, got[pid], e)


def test_single_vertex_way_zero_length(spark):
    df = spark.createDataFrame(
        [(1, [{"lon": 8.0, "lat": 51.0}])],
        "way_id long, geom array<struct<lon:double,lat:double>>",
    )
    got = way_length_m(df).collect()
    assert got[0]["length_m"] == 0.0
