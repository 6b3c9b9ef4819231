"""Spatial operators (G3-G6) vs numpy brute-force oracles."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from wayproblems_spark.fixtures.pages import generate_corpus, pages_df
from wayproblems_spark.operators.cells import (
    MAX_LEVEL,
    cell_udf,
    latlon_to_cell,
    parent_id_expr,
)
from wayproblems_spark.operators.knn import EARTH_RADIUS_M, knn_nearest_way
from wayproblems_spark.operators.pip import point_in_polygon
from wayproblems_spark.operators.resolve import drop_invalid_geometry, resolve_locations
from wayproblems_spark.operators.tiles import PIX, rasterize, raster_to_vector, tile_counts
from wayproblems_spark.sources.pages_source import nodes_from_pages, polys_from_pages, ways_from_pages


def _corpus_frames(spark, seed=21, n_pages=250):
    corpus = generate_corpus(n_pages=n_pages, seed=seed, split="unit")
    pdf = pages_df(spark, corpus)
    ways = ways_from_pages(pdf).drop("src_url")
    nodes = nodes_from_pages(pdf)
    polys = polys_from_pages(pdf)
    return corpus, ways, nodes, polys


def _hav_np(lat1, lon1, lat2, lon2):
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dphi = np.radians(lat2 - lat1) / 2
    dlam = np.radians(lon2 - lon1) / 2
    a = np.sin(dphi) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlam) ** 2
    return 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))


def test_cell_udf_matches_numpy(spark):
    corpus, _, nodes, _ = _corpus_frames(spark)
    got = {
        r["node_id"]: r["c"]
        for r in nodes.withColumn("c", cell_udf(12)(F.col("lat"), F.col("lon"))).collect()
    }
    ids = np.array([n[0] for n in corpus["nodes"]])
    lats = np.array([n[1] for n in corpus["nodes"]])
    lons = np.array([n[2] for n in corpus["nodes"]])
    exp = latlon_to_cell(lats, lons, 12).view(np.int64)
    for nid, e in zip(ids, exp):
        assert got[int(nid)] == int(e)


def test_grid_expr_matches_numpy(spark):
    """grid_expr_from_xyz (pure-JVM packed grid id over XYZ columns — the
    kNN hot path's zero-Python encoder) is bit-identical to the numpy
    latlon_to_grid across a dense multi-face lattice INCLUDING face-edge
    and near-pole bands, at coarse/bench/leaf levels. Past the xyz trig,
    every op is correctly-rounded IEEE, so agreement is exact unless the
    JVM/libm cos-sin ulp gap flips a boundary point — none observed on
    this lattice nor on 3.6M bench points × 5 levels."""
    from wayproblems_spark.operators.cells import grid_expr_from_xyz, latlon_to_grid
    from wayproblems_spark.operators.knn import _with_xyz

    lats = np.linspace(-89.999, 89.999, 161)
    lons = np.linspace(-179.999, 179.999, 321)
    grid = [(float(la), float(lo)) for la in lats for lo in lons]
    df = spark.createDataFrame(grid, "lat double, lon double")
    p = _with_xyz(df, "lat", "lon", "p")
    for level in (4, 16, MAX_LEVEL):
        rows = (
            p.withColumn(
                "g", grid_expr_from_xyz(F.col("px"), F.col("py"), F.col("pz"), level)
            )
            .select("lat", "lon", "g")
            .collect()
        )
        la = np.array([r["lat"] for r in rows])
        lo = np.array([r["lon"] for r in rows])
        exp = latlon_to_grid(la, lo, level)
        got = np.array([r["g"] for r in rows])
        assert (got == exp).all(), f"level {level}: {int((got != exp).sum())} mismatches"


def test_parent_expr_matches_numpy(spark):
    corpus, _, nodes, _ = _corpus_frames(spark)
    df = nodes.withColumn("leaf", cell_udf(MAX_LEVEL)(F.col("lat"), F.col("lon")))
    df = df.withColumn("p10", parent_id_expr(F.col("leaf"), 10))
    got = {r["node_id"]: r["p10"] for r in df.collect()}
    lats = np.array([n[1] for n in corpus["nodes"]])
    lons = np.array([n[2] for n in corpus["nodes"]])
    exp = latlon_to_cell(lats, lons, 10).view(np.int64)
    for (nid, _, _), e in zip(corpus["nodes"], exp):
        assert got[nid] == int(e)


def test_point_in_polygon_vs_oracle(spark):
    corpus, _, nodes, polys = _corpus_frames(spark)
    pts = nodes.select(F.col("node_id").alias("point_id"), "lat", "lon")
    got = {
        (r["point_id"], r["poly_id"])
        for r in point_in_polygon(spark, pts, polys, level=10).collect()
    }

    exp = set()
    for nid, lat, lon in corpus["nodes"]:
        for pid, _, ring in corpus["polys"]:
            xs = np.array([p[0] for p in ring])
            ys = np.array([p[1] for p in ring])
            inside = False
            for k in range(len(ring) - 1):
                ax, ay, bx, by = xs[k], ys[k], xs[k + 1], ys[k + 1]
                if (ay > lat) != (by > lat) and lon < (bx - ax) * (lat - ay) / (by - ay) + ax:
                    inside = not inside
            if inside:
                exp.add((nid, pid))
    assert got == exp
    assert len(exp) > 0


def test_pip_boundary_counts_inside(spark):
    square = [(8.0, 51.0), (9.0, 51.0), (9.0, 52.0), (8.0, 52.0), (8.0, 51.0)]
    polys = spark.createDataFrame(
        [(1, "admin", square)],
        "poly_id long, kind string, ring array<struct<lon:double,lat:double>>",
    )
    pts = spark.createDataFrame(
        [
            (1, 51.0, 8.5),   # on bottom edge
            (2, 51.0, 8.0),   # on corner
            (3, 51.5, 8.5),   # interior
            (4, 50.5, 8.5),   # outside
        ],
        "point_id long, lat double, lon double",
    )
    got = {r["point_id"] for r in point_in_polygon(spark, pts, polys, level=8).collect()}
    assert got == {1, 2, 3}


def test_knn_vs_bruteforce(spark):
    corpus, ways, nodes, _ = _corpus_frames(spark, seed=33, n_pages=300)
    resolved = drop_invalid_geometry(resolve_locations(ways, nodes, broadcast_nodes=True))
    pts = nodes.select(F.col("node_id").alias("point_id"), "lat", "lon")
    got = {
        r["point_id"]: (r["way_id"], r["dist_m"])
        for r in knn_nearest_way(pts, resolved, level=12).collect()
    }

    # numpy brute force on generator ground truth
    node_pos = {n[0]: (n[1], n[2]) for n in corpus["nodes"]}
    verts = []  # (way_id, lat, lon)
    for wid, _, _, _, _, _, refs, _ in corpus["ways"]:
        pts_r = [node_pos[r] for r in refs if r in node_pos]
        if len(pts_r) < 2:
            continue
        for la, lo in pts_r:
            verts.append((wid, la, lo))
    vw = np.array([v[0] for v in verts])
    vla = np.array([v[1] for v in verts])
    vlo = np.array([v[2] for v in verts])

    assert len(got) == len(corpus["nodes"])
    for nid, la, lo in corpus["nodes"]:
        d = _hav_np(la, lo, vla, vlo)
        best = np.lexsort((vw, d))[0]
        gw, gd = got[nid]
        assert gw == vw[best], (nid, gw, vw[best], gd, d[best])
        assert abs(gd - d[best]) < 1e-6


def test_tiles_vs_oracle(spark):
    corpus, ways, nodes, _ = _corpus_frames(spark, seed=5, n_pages=200)
    from wayproblems_spark.rules import problems

    resolved = drop_invalid_geometry(resolve_locations(ways, nodes, broadcast_nodes=True))
    probs = problems(resolved)
    z = 12
    got = {
        (r["tile_z"], r["tile_x"], r["tile_y"], r["layer"]): r["problem_count"]
        for r in tile_counts(probs, z).collect()
    }

    # oracle: python recomputation from collected problems + anchors
    rows = probs.select("layer", F.element_at("geom", 1).alias("a")).collect()
    exp: dict = {}
    n = 1 << z
    for r in rows:
        lon, lat = r["a"]["lon"], r["a"]["lat"]
        x = min(max(int((lon + 180) / 360 * n), 0), n - 1)
        y = min(
            max(int((1 - math.log(math.tan(math.radians(lat)) + 1 / math.cos(math.radians(lat))) / math.pi) / 2 * n), 0),
            n - 1,
        )
        k = (z, x, y, r["layer"])
        exp[k] = exp.get(k, 0) + 1
    assert got == exp and len(got) > 5

    # raster → vector roundtrip conserves counts
    ras = rasterize(probs, z)
    vec = raster_to_vector(ras)
    total_pixels = ras.agg(F.sum("n")).collect()[0][0]
    total_vec = vec.agg(F.sum("total")).collect()[0][0]
    n_problems = probs.count()
    assert total_pixels == total_vec == n_problems
    one = vec.first()
    assert all(p["pidx"] < PIX * PIX for p in one["pixels"])


def test_tile_pyramid_matches_per_level_counts(spark):
    from wayproblems_spark.operators.tiles import tile_pyramid
    from wayproblems_spark.rules import problems

    corpus, ways, nodes, _ = _corpus_frames(spark, seed=5, n_pages=150)
    resolved = drop_invalid_geometry(resolve_locations(ways, nodes, broadcast_nodes=True))
    probs = problems(resolved)
    pyr = {
        (r["tile_z"], r["tile_x"], r["tile_y"], r["layer"]): r["problem_count"]
        for r in tile_pyramid(probs, 8, 12).collect()
    }
    for z in (8, 10, 12):
        per = {
            (r["tile_z"], r["tile_x"], r["tile_y"], r["layer"]): r["problem_count"]
            for r in tile_counts(probs, z).collect()
        }
        assert per == {k: v for k, v in pyr.items() if k[0] == z}


def test_bit_stability_across_parallelism(spark):
    """north_rule: identical join rows and tile assignments when the same
    job runs at different parallelism (here: different shuffle partitioning
    and input splits within one session; the full local[8]/local[32] run is
    bench.py's job)."""
    corpus, ways, nodes, _ = _corpus_frames(spark, seed=77, n_pages=250)
    from wayproblems_spark.rules import problems

    def run(parts):
        w = ways.repartition(parts)
        n = nodes.repartition(parts)
        resolved = drop_invalid_geometry(resolve_locations(w, n))
        probs = problems(resolved)
        tiles = tile_counts(probs, 12)
        pts = n.select(F.col("node_id").alias("point_id"), "lat", "lon")
        knn = knn_nearest_way(pts, resolved, level=12)
        return (
            sorted(map(tuple, probs.select("way_id", "site", "sub", "layer", "problem").collect())),
            sorted(map(tuple, tiles.collect())),
            sorted(map(tuple, knn.collect())),
        )

    a = run(2)
    b = run(13)
    assert a == b


def test_tile_pyramid_rollup_equals_direct(spark):
    """The z_max rollup (2 shuffles, ~#tiles rows) must be bit-identical
    to the direct per-zoom floor computation, clamps included."""
    from wayproblems_spark.operators.resolve import (
        drop_invalid_geometry as _dig,
        resolve_locations as _rl,
    )
    from wayproblems_spark.operators.tiles import tile_pyramid, tile_pyramid_direct
    from wayproblems_spark.rules import problems as _problems

    corpus, ways, nodes, _ = _corpus_frames(spark, seed=41, n_pages=250)
    probs = _problems(_dig(_rl(ways, nodes, broadcast_nodes=True)))
    a = sorted(map(tuple, tile_pyramid(probs, 6, 15).collect()))
    b = sorted(map(tuple, tile_pyramid_direct(probs, 6, 15).collect()))
    assert a == b and len(a) > 100

    # extreme coordinates: clamp paths must agree too
    extreme = spark.createDataFrame(
        [(1, "wayproblems", [{"lon": -180.0, "lat": 89.9}]),
         (2, "ref", [{"lon": 180.0, "lat": -89.9}]),
         (3, "defaults", [{"lon": 0.0, "lat": 85.06}]),
         (4, "strange", [{"lon": -179.99999, "lat": -85.06}])],
        "way_id long, layer string, geom array<struct<lon:double,lat:double>>",
    )
    a = sorted(map(tuple, tile_pyramid(extreme, 3, 12).collect()))
    b = sorted(map(tuple, tile_pyramid_direct(extreme, 3, 12).collect()))
    assert a == b


def test_covering_cells_sound_across_faces():
    """The cover must be a superset of the cells of every bbox point — in
    particular for bboxes straddling S2 face boundaries (lon ±45/±135, the
    equator/polar seams) and for wide same-face bboxes where the gnomonic
    st extrema sit on the face-center meridian, not at corners (the two
    round-2 under-cover modes)."""
    rng = np.random.RandomState(7)
    cases = [
        (40.0, 50.0, 10.0, 20.0),    # face 0/1 seam at lon 45
        (43.0, 47.0, 43.0, 47.0),    # lon seam + equatorial/polar seam
        (-10.0, 10.0, 30.0, 60.0),   # wide: interior st extrema at lon 0
        (130.0, 140.0, 80.0, 89.5),  # polar cap (face 2)
        (-46.0, -44.0, -46.0, -44.0),
    ]
    for _ in range(10):
        lo0 = rng.uniform(-175, 160)
        la0 = rng.uniform(-85, 70)
        cases.append((lo0, lo0 + rng.uniform(0.01, 15), la0, la0 + rng.uniform(0.01, 15)))
    for lon0, lon1, lat0, lat1 in cases:
        for level in (8, 10, 12):
            from wayproblems_spark.operators.cells import covering_cells

            cov = set(covering_cells(lon0, lat0, lon1, lat1, level).tolist())
            la = np.concatenate(
                [rng.uniform(lat0, lat1, 2000), [lat0, lat1, lat0, lat1]]
            )
            lo = np.concatenate(
                [rng.uniform(lon0, lon1, 2000), [lon0, lon0, lon1, lon1]]
            )
            cells = latlon_to_cell(la, lo, level).view(np.int64)
            assert not set(cells.tolist()) - cov, (lon0, lon1, lat0, lat1, level)


def test_pip_face_spanning_polygon(spark):
    """A polygon straddling lon 45° (face 0/1 boundary): every inside point
    must be found — the round-2 corner-cell fallback silently dropped the
    cells between the corners here (VERDICT r2 'wrong #1')."""
    ring = [(43.0, 10.0), (47.0, 10.0), (47.0, 14.0), (43.0, 14.0), (43.0, 10.0)]
    polys = spark.createDataFrame(
        [(1, "admin", ring)],
        "poly_id long, kind string, ring array<struct<lon:double,lat:double>>",
    )
    rng = np.random.RandomState(3)
    la = rng.uniform(9.0, 15.0, 800)
    lo = rng.uniform(42.0, 48.0, 800)
    pts = spark.createDataFrame(
        [(int(i), float(la[i]), float(lo[i])) for i in range(800)],
        "point_id long, lat double, lon double",
    )
    got = {r["point_id"] for r in point_in_polygon(spark, pts, polys, level=10).collect()}
    exp = {
        int(i)
        for i in range(800)
        if 43.0 <= lo[i] <= 47.0 and 10.0 <= la[i] <= 14.0
    }
    assert got == exp and len(exp) > 100


def test_knn_materialized_path_identical(spark, tmp_path):
    """materialize_dir (bucketed-parquet index + parquet vertex frame, the
    cluster-scale replacement for .persist()) must produce bit-identical
    assignments to the in-memory path."""
    from wayproblems_spark.plans.checkpoint import content_fingerprint

    corpus, ways, nodes, _ = _corpus_frames(spark, seed=33, n_pages=300)
    resolved = drop_invalid_geometry(resolve_locations(ways, nodes, broadcast_nodes=True))
    pts = nodes.select(F.col("node_id").alias("point_id"), "lat", "lon")
    mem = knn_nearest_way(pts, resolved, level=12)
    mat = knn_nearest_way(
        pts, resolved, level=12, materialize_dir=str(tmp_path / "knn_mat")
    )
    cols = lambda df: df.select("point_id", "way_id", F.round("dist_m", 6).alias("d"))
    assert content_fingerprint(cols(mem)) == content_fingerprint(cols(mat))


def test_covering_cells_antimeridian_split():
    """A lon0 > lon1 bbox (antimeridian wrap) must cover BOTH sides of
    ±180 — the union of the two half-covers — and reject garbage ranges
    (VERDICT r3 'wrong #3': the old code silently swept the wrong side)."""
    import numpy as np
    import pytest

    from wayproblems_spark.operators.cells import covering_cells

    wrap = covering_cells(178.0, -20.0, -178.0, -16.0, 9)
    east = covering_cells(178.0, -20.0, 180.0, -16.0, 9)
    west = covering_cells(-180.0, -20.0, -178.0, -16.0, 9)
    assert set(wrap.tolist()) == set(np.concatenate([east, west]).tolist())
    with pytest.raises(ValueError):
        covering_cells(190.0, -20.0, -178.0, -16.0, 9)


def test_pip_antimeridian_polygon_vs_oracle(spark):
    """A Fiji-style polygon crossing ±180 must classify points on BOTH
    sides correctly (cover split + shifted-lon ray cast); oracle = numpy
    even-odd in the shifted [0,360) space."""
    import numpy as np

    # square lon 178 .. -178 (= 182 shifted), lat -20 .. -16
    ring = [(178.0, -20.0), (-178.0, -20.0), (-178.0, -16.0), (178.0, -16.0), (178.0, -20.0)]
    polys = spark.createDataFrame(
        [(1, "admin", ring)],
        "poly_id long, kind string, ring array<struct<lon:double,lat:double>>",
    )
    rng = np.random.RandomState(5)
    lo = rng.uniform(176.0, 184.0, 600)  # spans the seam
    lo = np.where(lo > 180.0, lo - 360.0, lo)
    la = rng.uniform(-22.0, -14.0, 600)
    pts = spark.createDataFrame(
        [(int(i), float(la[i]), float(lo[i])) for i in range(600)],
        "point_id long, lat double, lon double",
    )
    got = {r["point_id"] for r in point_in_polygon(spark, pts, polys, level=9).collect()}
    lo_s = np.where(lo < 0, lo + 360.0, lo)
    exp = {
        int(i)
        for i in range(600)
        if 178.0 <= lo_s[i] <= 182.0 and -20.0 <= la[i] <= -16.0
    }
    assert got == exp
    # both sides of the seam must be represented
    assert any(lo[i] > 0 for i in exp) and any(lo[i] < 0 for i in exp)


def test_pip_polygon_with_holes(spark):
    """An optional `holes` column must exclude hole interiors via the same
    even-odd parity count (no special-casing); hole boundaries follow the
    boundary-counts-as-INSIDE tie rule."""
    outer = [(8.0, 51.0), (9.0, 51.0), (9.0, 52.0), (8.0, 52.0), (8.0, 51.0)]
    hole = [(8.4, 51.4), (8.6, 51.4), (8.6, 51.6), (8.4, 51.6), (8.4, 51.4)]
    polys = spark.createDataFrame(
        [(1, "admin", outer, [hole])],
        "poly_id long, kind string, ring array<struct<lon:double,lat:double>>, "
        "holes array<array<struct<lon:double,lat:double>>>",
    )
    pts = spark.createDataFrame(
        [
            (1, 51.5, 8.5),    # inside the hole -> excluded
            (2, 51.2, 8.2),    # in the annulus -> inside
            (3, 51.5, 8.4),    # on the hole boundary -> inside (tie rule)
            (4, 50.5, 8.5),    # outside everything
            (5, 51.0, 8.5),    # on the outer boundary -> inside
        ],
        "point_id long, lat double, lon double",
    )
    got = {r["point_id"] for r in point_in_polygon(spark, pts, polys, level=8).collect()}
    assert got == {2, 3, 5}
    # and a frame WITHOUT the holes column keeps the old behavior
    polys_nh = spark.createDataFrame(
        [(1, "admin", outer)],
        "poly_id long, kind string, ring array<struct<lon:double,lat:double>>",
    )
    got_nh = {r["point_id"] for r in point_in_polygon(spark, pts, polys_nh, level=8).collect()}
    assert got_nh == {1, 2, 3, 5}


def test_pip_prebuilt_index_identical(spark):
    """build_pip_index + prebuilt= (build-once/query-many) must return
    exactly what the per-call path returns."""
    from wayproblems_spark.operators.pip import build_pip_index

    corpus, _, nodes, polys = _corpus_frames(spark)
    pts = nodes.select(F.col("node_id").alias("point_id"), "lat", "lon")
    direct = sorted(map(tuple, point_in_polygon(spark, pts, polys, level=10).collect()))
    idx = build_pip_index(spark, polys, level=10)
    via = sorted(
        map(tuple, point_in_polygon(spark, pts, None, level=10, prebuilt=idx).collect())
    )
    assert via == direct and len(direct) > 0


def test_pip_prebuilt_level_packed(spark):
    """The prebuilt tuple carries its build level (like build_knn_index):
    a caller passing a MISMATCHED level= with prebuilt= must still get the
    correct result — point cells are assigned at the index's level, so the
    containment join cannot silently empty (ADVICE r4 medium)."""
    from wayproblems_spark.operators.pip import build_pip_index, unpersist_pip_index

    corpus, _, nodes, polys = _corpus_frames(spark)
    pts = nodes.select(F.col("node_id").alias("point_id"), "lat", "lon")
    direct = sorted(map(tuple, point_in_polygon(spark, pts, polys, level=10).collect()))
    idx = build_pip_index(spark, polys, level=10)
    assert idx[0] == 10
    # wrong level=4 argument is ignored in favor of the packed level
    via = sorted(
        map(tuple, point_in_polygon(spark, pts, None, level=4, prebuilt=idx).collect())
    )
    unpersist_pip_index(idx)
    assert via == direct and len(direct) > 0


def test_pip_distributed_build_identical(spark):
    """build_pip_index(distributed=True) runs the cover/edge extraction
    executor-side via mapInPandas; the resulting bucket and edge tables —
    and therefore the PIP results — must be IDENTICAL to the driver-loop
    path (same per-polygon kernel, different placement). Exercises holes
    and an antimeridian wrap polygon so every normalization branch runs
    on both paths (VERDICT r4 next-round #5)."""
    from wayproblems_spark.operators.pip import build_pip_index, unpersist_pip_index

    outer = [(8.0, 51.0), (9.0, 51.0), (9.0, 52.0), (8.0, 52.0), (8.0, 51.0)]
    hole = [(8.4, 51.4), (8.6, 51.4), (8.6, 51.6), (8.4, 51.6), (8.4, 51.4)]
    fiji = [(178.0, -20.0), (-178.0, -20.0), (-178.0, -16.0), (178.0, -16.0), (178.0, -20.0)]
    polys = spark.createDataFrame(
        [(1, "admin", outer, [hole]), (2, "admin", fiji, None)],
        "poly_id long, kind string, ring array<struct<lon:double,lat:double>>, "
        "holes array<array<struct<lon:double,lat:double>>>",
    )
    drv = build_pip_index(spark, polys, level=9, persist=False)
    dist = build_pip_index(spark, polys, level=9, distributed=True, persist=True)
    assert drv[0] == dist[0] == 9
    for i in (1, 2):
        assert sorted(map(tuple, drv[i].collect())) == sorted(
            map(tuple, dist[i].collect())
        )
    pts = spark.createDataFrame(
        [(1, 51.2, 8.2), (2, 51.5, 8.5), (3, -18.0, 179.5), (4, -18.0, -179.5), (5, 0.0, 0.0)],
        "point_id long, lat double, lon double",
    )
    got = sorted(
        map(tuple, point_in_polygon(spark, pts, None, prebuilt=dist).collect())
    )
    unpersist_pip_index(dist)
    assert got == [(1, 1, "admin"), (3, 2, "admin"), (4, 2, "admin")]


def test_pip_distributed_build_100k_polys(spark):
    """Bound test: the distributed build must handle a polygon layer past
    the driver loop's practical budget (>=1e5 polygons; VERDICT r4
    "wrong #3") — the layer is generated distributively with codegen
    exprs, covers/edges are extracted executor-side, and only the
    broadcast-sized result tables come back."""
    from wayproblems_spark.operators.pip import build_pip_index, unpersist_pip_index

    n = 100_000
    h = 0.003
    cx = (F.col("id") % 1000).cast("double") * 0.01 + 8.0
    cy = (F.col("id") / 1000).cast("long").cast("double") * 0.01 + 40.0
    corner = lambda dx, dy: F.struct(
        (cx + dx * h).alias("lon"), (cy + dy * h).alias("lat")
    )
    polys = spark.range(0, n, 1, 32).select(
        F.col("id").alias("poly_id"),
        F.lit("grid").alias("kind"),
        F.array(
            corner(-1, -1), corner(1, -1), corner(1, 1), corner(-1, 1), corner(-1, -1)
        ).alias("ring"),
    )
    idx = build_pip_index(spark, polys, level=12, samples=9, distributed=True)
    try:
        assert idx[2].count() == 4 * n
        b = idx[1].count()
        assert b >= n  # every polygon covered by >= 1 cell
        # a point in the middle of a known polygon resolves correctly
        pts = spark.createDataFrame(
            [(7, 40.0005, 8.0505)], "point_id long, lat double, lon double"
        )
        got = point_in_polygon(spark, pts, None, prebuilt=idx).collect()
        assert [(r["point_id"], r["poly_id"]) for r in got] == [(7, 5)]
    finally:
        unpersist_pip_index(idx)
