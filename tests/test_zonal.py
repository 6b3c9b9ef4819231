"""zonal_stats vs an exact-rational Python reference (independent ray
cast over Fraction arithmetic — shared with test_overlay)."""

from __future__ import annotations

from decimal import Decimal
from fractions import Fraction

from pyspark.sql import functions as F

from wayproblems_spark.operators.zonal import zonal_stats

from tests.test_overlay import _point_in_rings, _square, _diamond, _poly_df

POLYS = [
    (1, _square(10.0, 10.0, 2.0)),
    (2, _diamond(13.0, 10.0, 2.5)),   # overlaps 1's east flank
    (3, _square(30.0, 10.0, 1.0)),    # holds few points
]
HOLES = {1: [_square(10.0, 10.0, 0.5)]}


def _points():
    """Quarter-degree lattice sweep over both clusters + payload values
    with ≤2 fractional digits (exact in decimal(38,6) and double)."""
    pts = []
    pid = 0
    for gx in range(0, 100):
        for gy in range(0, 24):
            x = 6.0 + gx * 0.25
            y = 7.0 + gy * 0.25
            pts.append((pid, y, x, (pid % 400) / 4.0))
            pid += 1
    return pts


def _expected():
    pts = _points()
    rings = {
        pid: [ring] + HOLES.get(pid, [])
        for pid, ring in POLYS
    }
    agg = {}
    for pid, ring_set in rings.items():
        vals = [
            v
            for (qid, y, x, v) in pts
            if _point_in_rings((Fraction(x).limit_denominator(), Fraction(y).limit_denominator()), ring_set)
        ]
        if vals:
            agg[pid] = (
                len(vals),
                sum(Fraction(v).limit_denominator() for v in vals),
                min(vals),
                max(vals),
            )
    return agg


def test_zonal_stats_matches_reference(spark):
    pts = spark.createDataFrame(
        _points(), "point_id long, lat double, lon double, val double"
    )
    polys = _poly_df(spark, POLYS, HOLES)
    got = zonal_stats(
        spark, pts, polys, value_cols=("val",), level=9
    ).collect()
    exp = _expected()
    assert {r["poly_id"] for r in got} == set(exp)
    for r in got:
        n, s, lo, hi = exp[r["poly_id"]]
        assert r["n_points"] == n
        assert r["val_sum"] == Decimal(s.numerator) / Decimal(s.denominator)
        assert r["val_min"] == lo
        assert r["val_max"] == hi
        assert r["val_avg"] == float(r["val_sum"]) / n


def test_zonal_stats_no_values(spark):
    pts = spark.createDataFrame(
        _points(), "point_id long, lat double, lon double, val double"
    )
    polys = _poly_df(spark, POLYS, HOLES)
    got = zonal_stats(spark, pts, polys, level=9)
    assert got.columns == ["poly_id", "kind", "n_points"]
    exp = _expected()
    assert {(r["poly_id"], r["n_points"]) for r in got.collect()} == {
        (pid, v[0]) for pid, v in exp.items()
    }
