"""chunk_documents vs a pure-Python reference; simplify_ways vs an
independent recursive Douglas-Peucker + the within-tolerance guarantee."""

from __future__ import annotations

import math
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from wayproblems_spark.operators.chunking import chunk_documents
from wayproblems_spark.operators.geometry import simplify_ways
from wayproblems_spark.operators.knn import EARTH_RADIUS_M

# --- chunking --------------------------------------------------------------

DOCS = [
    (0, ""),                                   # no chunks
    (1, "one"),                                # single short chunk
    (2, " ".join(f"t{i}" for i in range(8))),  # == target
    (3, " ".join(f"t{i}" for i in range(9))),  # just above target
    (4, " ".join(f"t{i}" for i in range(40))), # many chunks
    (5, "Punct, strips; to -- tokens!"),
]
TARGET, OVERLAP = 8, 3
STEP = TARGET - OVERLAP


def _tok(text):
    return [t for t in re.sub(r"[^a-z0-9\s]", "", text.lower()).split() if t]


def _py_chunks(text):
    toks = _tok(text)
    n = len(toks)
    if n == 0:
        return []
    n_chunks = 1 if n <= TARGET else 1 + math.ceil((n - TARGET) / STEP)
    return [
        (i, toks[i * STEP : i * STEP + TARGET]) for i in range(n_chunks)
    ]


def test_chunking_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(df, TARGET, OVERLAP).collect()
    }
    exp = {
        (d, i): (len(c), " ".join(c))
        for d, t in DOCS
        for i, c in _py_chunks(t)
    }
    assert got == exp
    # consecutive full chunks share exactly OVERLAP tokens
    c0 = got[(4, 0)][1].split()
    c1 = got[(4, 1)][1].split()
    assert c0[-OVERLAP:] == c1[:OVERLAP]
    # last chunk ends exactly at the final token (no degenerate tail)
    toks4 = _tok(DOCS[4][1])
    last_idx = max(i for d, i in got if d == 4)
    assert got[(4, last_idx)][1].split()[-1] == toks4[-1]


def test_chunking_param_guard(spark):
    df = spark.createDataFrame(DOCS[:1], "doc_id long, text string")
    for bad in ((8, 8), (8, -1), (0, 0)):
        with pytest.raises(ValueError):
            chunk_documents(df, *bad)


# --- simplification --------------------------------------------------------


def _xyz(lon, lat):
    rl, rn = math.radians(lat), math.radians(lon)
    return np.array(
        [math.cos(rl) * math.cos(rn), math.cos(rl) * math.sin(rn), math.sin(rl)]
    )


def _seg_d2(p, a, b):
    ab = b - a
    ab2 = float(ab @ ab)
    if ab2 == 0.0:
        return float(((p - a) ** 2).sum())
    t = min(max(float((p - a) @ ab / ab2), 0.0), 1.0)
    return float(((p - (a + t * ab)) ** 2).sum())


def _py_dp(pts, tol2):
    """Independent RECURSIVE Douglas-Peucker, same chord metric."""
    xyz = [_xyz(lon, lat) for lon, lat in pts]

    def rec(i, j, keep):
        if j <= i + 1:
            return
        d2s = [_seg_d2(xyz[k], xyz[i], xyz[j]) for k in range(i + 1, j)]
        kmax = int(np.argmax(d2s))
        if d2s[kmax] > tol2:
            k = i + 1 + kmax
            keep.add(k)
            rec(i, k, keep)
            rec(k, j, keep)

    keep = {0, len(pts) - 1}
    rec(0, len(pts) - 1, keep)
    return [pts[i] for i in sorted(keep)]


def _tol2(tol_m):
    c = 2.0 * math.sin((tol_m / EARTH_RADIUS_M) / 2.0)
    return c * c


def _mk_ways():
    ways = []
    # straight line with tiny jitter (collapses to endpoints at 500 m)
    ways.append(
        (0, [(10.0 + i * 0.01, 50.0 + (i % 2) * 0.000_5) for i in range(20)])
    )
    # zigzag with ~5 km spikes (every spike survives 500 m)
    ways.append(
        (1, [(20.0 + i * 0.02, 40.0 + (i % 2) * 0.05) for i in range(15)])
    )
    # deterministic pseudo-random walks
    for w in range(2, 8):
        pts, lon, lat = [], -120.0 + w, -30.0 + w
        for i in range(30):
            lon += (((w * 31 + i * 17) % 13) - 6) * 0.004
            lat += (((w * 7 + i * 29) % 11) - 5) * 0.004
            pts.append((lon, lat))
        ways.append((w, pts))
    ways.append((8, [(0.0, 0.0), (1.0, 1.0)]))  # <=2 vertices: passthrough
    return ways


def test_simplify_matches_recursive_reference(spark):
    tol_m = 500.0
    ways = _mk_ways()
    df = spark.createDataFrame(
        [(i, [{"lon": lo, "lat": la} for lo, la in p]) for i, p in ways],
        "way_id long, geom array<struct<lon:double,lat:double>>",
    )
    got = {
        r["way_id"]: [(v["lon"], v["lat"]) for v in r["geom"]]
        for r in simplify_ways(df, tol_m).collect()
    }
    tol2 = _tol2(tol_m)
    for wid, pts in ways:
        exp = _py_dp(pts, tol2) if len(pts) > 2 else pts
        assert got[wid] == exp, wid
    assert len(got[0]) == 2        # jitter line collapsed
    assert len(got[1]) == 15       # zigzag fully kept
    # DP guarantee: every original vertex within tol of the kept chain
    for wid, pts in ways:
        kept = [_xyz(lo, la) for lo, la in got[wid]]
        for lo, la in pts:
            p = _xyz(lo, la)
            d2 = min(
                _seg_d2(p, kept[k], kept[k + 1]) for k in range(len(kept) - 1)
            )
            assert d2 <= tol2 + 1e-18, wid
