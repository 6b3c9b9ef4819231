"""Fixed-spacing polyline resampling (geometry.resample_ways) vs a
pure-Python slerp reference and analytic closed forms (equator line),
plus degenerate-geometry contracts."""

from __future__ import annotations

import math

import pytest

R = 6371008.8  # EARTH_RADIUS_M (knn.py)


def _xyz(lon, lat):
    rl, rn = math.radians(lat), math.radians(lon)
    return (
        math.cos(rl) * math.cos(rn),
        math.cos(rl) * math.sin(rn),
        math.sin(rl),
    )


def _arc(p, q):
    chord = math.dist(p, q)
    return 2.0 * math.asin(min(chord / 2.0, 1.0))


def _py_resample(pts, spacing_m):
    p = [_xyz(lon, lat) for lon, lat in pts]
    arcs = [_arc(p[i], p[i + 1]) for i in range(len(p) - 1)]
    cum = [0.0]
    for a in arcs:
        cum.append(cum[-1] + a)
    total = cum[-1]
    sp = spacing_m / R
    out = []
    if total == 0.0:
        return [pts[0], pts[-1]]
    for k in range(int(total / sp) + 1):
        t = k * sp
        i = max(0, min(len(arcs) - 1,
                       _bisect_right(cum, t) - 1))
        th = arcs[i]
        f = (t - cum[i]) / th if th > 0 else 0.0
        a, b = p[i], p[i + 1]
        if th > 0:
            wa, wb, st = math.sin((1 - f) * th), math.sin(f * th), math.sin(th)
        else:
            wa, wb, st = 1.0, 0.0, 1.0
        q = tuple((wa * a[j] + wb * b[j]) / st for j in range(3))
        lon = math.degrees(math.atan2(q[1], q[0]))
        lat = math.degrees(math.atan2(q[2], math.hypot(q[0], q[1])))
        out.append((lon, lat))
    out.append(pts[-1])
    return out


def _bisect_right(arr, x):
    import bisect

    return bisect.bisect_right(arr, x)


def _hav_m(a, b):
    (lon1, lat1), (lon2, lat2) = a, b
    return R * _arc(_xyz(lon1, lat1), _xyz(lon2, lat2))


WAY = [(13.0, 52.0), (13.01, 52.004), (13.025, 52.0), (13.03, 52.01)]


def _df(spark, pts_list):
    rows = [
        (i, [{"lon": lon, "lat": lat} for lon, lat in pts])
        for i, pts in enumerate(pts_list)
    ]
    return spark.createDataFrame(
        rows, "way_id long, geom array<struct<lon:double,lat:double>>"
    )


def test_matches_python_reference(spark):
    from wayproblems_spark.operators.geometry import resample_ways

    out = resample_ways(_df(spark, [WAY]), 150.0).collect()
    ref = _py_resample(WAY, 150.0)
    assert len(out) == len(ref)
    for r in out:
        lon, lat = ref[r["seq"]]
        assert r["lon"] == pytest.approx(lon, abs=1e-9)
        assert r["lat"] == pytest.approx(lat, abs=1e-9)


def test_spacing_and_endpoints(spark):
    from wayproblems_spark.operators.geometry import resample_ways

    rows = sorted(
        resample_ways(_df(spark, [WAY]), 200.0).collect(),
        key=lambda r: r["seq"],
    )
    # first sample is the first vertex, last row the final vertex
    assert (rows[0]["lon"], rows[0]["lat"]) == WAY[0]
    assert (rows[-1]["lon"], rows[-1]["lat"]) == WAY[-1]
    # consecutive samples are exactly spacing apart ALONG THE PATH; the
    # chord between them is shorter when they straddle a vertex bend, so
    # assert <= spacing on the bendy way and == spacing on a straight one
    for a, b in zip(rows[:-2], rows[1:-1]):
        d = _hav_m((a["lon"], a["lat"]), (b["lon"], b["lat"]))
        assert d <= 200.0 * (1 + 1e-9)
    total = sum(
        _hav_m(WAY[i], WAY[i + 1]) for i in range(len(WAY) - 1)
    )
    assert len(rows) == int(total / 200.0) + 2

    straight = [(13.0, 52.0), (13.05, 52.02)]
    srows = sorted(
        resample_ways(_df(spark, [straight]), 200.0).collect(),
        key=lambda r: r["seq"],
    )
    for a, b in zip(srows[:-2], srows[1:-1]):
        d = _hav_m((a["lon"], a["lat"]), (b["lon"], b["lat"]))
        assert d == pytest.approx(200.0, rel=1e-6)


def test_equator_closed_form(spark):
    from wayproblems_spark.operators.geometry import resample_ways

    way = [(0.0, 0.0), (0.5, 0.0)]
    rows = sorted(
        resample_ways(_df(spark, [way]), 1000.0).collect(),
        key=lambda r: r["seq"],
    )
    step_deg = math.degrees(1000.0 / R)
    for r in rows[:-1]:
        assert r["lat"] == pytest.approx(0.0, abs=1e-12)
        assert r["lon"] == pytest.approx(r["seq"] * step_deg, abs=1e-9)


def test_degenerates(spark):
    from wayproblems_spark.operators.geometry import resample_ways

    dup = [(10.0, 10.0), (10.0, 10.0), (10.01, 10.0), (10.01, 10.0)]
    single = [(5.0, 5.0)]
    samepoint = [(7.0, 7.0), (7.0, 7.0)]
    out = resample_ways(_df(spark, [dup, single, samepoint]), 300.0)
    by_way = {}
    for r in out.collect():
        by_way.setdefault(r["way_id"], []).append(r)
    ref = _py_resample(dup, 300.0)
    assert len(by_way[0]) == len(ref)
    # single vertex and zero-length ways: the two endpoint rows
    assert len(by_way[1]) == 2 and by_way[1][0]["lon"] == 5.0
    assert len(by_way[2]) == 2 and {r["lat"] for r in by_way[2]} == {7.0}

    with pytest.raises(ValueError, match="spacing_m"):
        resample_ways(_df(spark, [dup]), 0.0)
