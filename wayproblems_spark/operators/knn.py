"""G5 — kNN nearest-way assignment (exact, bit-stable across parallelism).

Semantics: for each point, the nearest way measured as the minimum haversine
distance to any of the way's vertices, tie-broken by smallest way_id —
a total order, so results are identical regardless of cluster size or
partitioning (the north_rule bit-stability clause).

Physical plan (one vertex-side index, no candidate-row explosion):

  index:  each way vertex registers into its own grid cell AND every
          touching cell (wrapped 3×3 ring, CROSS-FACE CORRECT —
          cells.latlon_to_grid_ring); one groupBy collapses the vertex side
          to one row per cell carrying a struct array. Built once; at
          cluster scale it is reusable across point batches.
  tier 1: each point joins its SINGLE cell against the index — no point
          explosion, join output is one row per point — and the best
          candidate is an inline JVM array_min over the cell's struct
          array. Zero post-join aggregation, zero extra shuffle.
          Acceptance: best chord-dist < 0.95 × S2 min-edge(level) proves
          no vertex outside the ring can be closer (empirically the
          outside-ring minimum is ≥ 1.037 min-edge; see cells.py). Points
          in cube-CORNER cells (ring is only 7 cells there; 24 cells per
          level, all mid-ocean on Earth) are never accepted by the bound —
          they escalate regardless.
  tier 2: the (rare) escalated points are BROADCAST ring-exploded against
          a narrow re-keyed vertex scan at `coarse_level` — map-side hash
          join, no vertex shuffle — then one tiny per-point min.
  tier 3: the remainder is broadcast against the full vertex scan
          (BroadcastNestedLoopJoin) — exact by construction, and bounded:
          the stream side is one vertex scan, the broadcast side is only
          points that found nothing within ~8 coarse cells (ocean-grade
          isolation) or sit on one of the 24 cube-corner cells.

Compared to a ring-join formulation (point × 9 cells × occupancy candidate
rows through a shuffle+groupBy), this plan shuffles the vertex side once
(index build), the point side once (cell equi-join), and nothing else.

Distances: trig-free squared 3D chord per candidate (strictly monotonic in
great-circle distance), converted to haversine meters only for each point's
single winner. min over a set → no float reduction-order dependence.

Reference parity: the C++ engine has no kNN (the graft adds it); semantics
follow the nearest-vertex assignment used by its spatialite consumers.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cells import grid_udf, ring_grid_udf, with_grid

EARTH_RADIUS_M = 6371008.8

# Minimum S2 cell edge length at level L: kMinEdge ≈ 2*sqrt(2)/3 / 2^L rad.
_MIN_EDGE_RAD = 2.0 * math.sqrt(2.0) / 3.0
# Acceptance uses 0.95 × min-edge: stress sampling across face edges and
# corners measured the true outside-ring minimum at ≥ 1.037 min-edge, so
# 0.95 keeps a 9% sound margin while barely widening escalation.
_ACCEPT_FACTOR = 0.95


def cell_min_edge_m(level: int) -> float:
    return _MIN_EDGE_RAD / (1 << level) * EARTH_RADIUS_M


def _accept_chord2(level: int) -> float:
    """Squared unit-sphere chord corresponding to the acceptance arc."""
    theta = _ACCEPT_FACTOR * _MIN_EDGE_RAD / (1 << level)
    return (2.0 * math.sin(theta / 2.0)) ** 2


def haversine_m(lat1, lon1, lat2, lon2):
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1) / 2.0
    dlam = F.radians(lon2 - lon1) / 2.0
    a = F.sin(dphi) ** 2 + F.cos(rl1) * F.cos(rl2) * F.sin(dlam) ** 2
    return 2.0 * EARTH_RADIUS_M * F.asin(F.sqrt(a))


def _with_xyz(df: DataFrame, lat_col: str, lon_col: str, prefix: str) -> DataFrame:
    """Unit-sphere XYZ — trig once per ROW so the candidate math needs none."""
    rl = F.radians(F.col(lat_col))
    rlon = F.radians(F.col(lon_col))
    return df.withColumns(
        {
            f"{prefix}x": F.cos(rl) * F.cos(rlon),
            f"{prefix}y": F.cos(rl) * F.sin(rlon),
            f"{prefix}z": F.sin(rl),
        }
    )


def _chord2(px, py, pz, vx, vy, vz):
    dx, dy, dz = px - vx, py - vy, pz - vz
    return dx * dx + dy * dy + dz * dz


def _chord2_to_m(c2):
    return 2.0 * EARTH_RADIUS_M * F.asin(F.sqrt(c2) / 2.0)


def is_corner_cell(gid, level: int):
    """Point's grid cell sits on BOTH face-boundary axes (cube corner) —
    its true neighborhood has 7 cells, so the ring bound must not accept."""
    lim = (1 << level) - 1
    mask = (1 << 29) - 1
    gi = F.shiftright(gid, 29).bitwiseAND(F.lit(mask))
    gj = gid.bitwiseAND(F.lit(mask))
    return (gi.isin(0, lim)) & (gj.isin(0, lim))


def way_vertices(resolved_ways: DataFrame) -> DataFrame:
    """Explode resolved geometries to (way_id, vlat, vlon)."""
    return resolved_ways.select(
        "way_id", F.explode("geom").alias("v")
    ).select("way_id", F.col("v.lat").alias("vlat"), F.col("v.lon").alias("vlon"))


def build_vertex_cell_index(verts_xyz: DataFrame, level: int) -> DataFrame:
    """(cell, vs: array<struct<vx,vy,vz,way_id>>) — each vertex registered
    in every cell whose 3×3 neighborhood contains it (ring symmetry:
    register the vertex into ITS own ring). One vertex shuffle total;
    occupancy is bounded by pick_level, so arrays stay ~9×target small.
    Corner-wrap duplicates within a ring are harmless (min-insensitive)."""
    ring = ring_grid_udf(level)
    return (
        verts_xyz.withColumn("cell", F.explode(ring(F.col("vlat"), F.col("vlon"))))
        .groupBy("cell")
        .agg(
            F.collect_list(F.struct("vx", "vy", "vz", "way_id")).alias("vs")
        )
    )


def pick_level(verts: DataFrame, probe_level: int = 12, target_occupancy: int = 4) -> int:
    """Density-adaptive cell level: probe occupancy at `probe_level`, then
    adjust so the mean verts-per-cell ≈ target. Keeps index arrays
    ~O(9 · target) instead of growing with density (the 100TB-scale
    guard)."""
    from .cells import MAX_LEVEL

    probed = with_grid(verts, "vlat", "vlon", probe_level, out="_g")
    row = probed.agg(
        F.count("*").alias("n"), F.approx_count_distinct("_g").alias("c")
    ).collect()[0]
    n, c = row["n"], max(row["c"], 1)
    occ = n / c
    level = probe_level
    while occ > 2 * target_occupancy and level < MAX_LEVEL - 2:
        level += 1
        occ /= 4.0
    while occ < target_occupancy / 4.0 and level > 4:
        level -= 1
        occ *= 4.0
    return level


def _broadcast_tier(esc: DataFrame, verts_xyz: DataFrame, level: int) -> DataFrame:
    """Escalation tier: broadcast the (small) escalated point set,
    ring-exploded at `level`, against a narrow vertex scan keyed at the
    same level — map-side join, no vertex shuffle. Returns
    (point_id, corner, best{c2, way_id})."""
    ring = ring_grid_udf(level)
    e = esc.select(
        "point_id", "px", "py", "pz",
        is_corner_cell(grid_udf(level)(F.col("lat"), F.col("lon")), level).alias("corner"),
        F.explode(ring(F.col("lat"), F.col("lon"))).alias("cell"),
    )
    vc = verts_xyz.withColumn(
        "cell", grid_udf(level)(F.col("vlat"), F.col("vlon"))
    )
    c2 = _chord2(
        F.col("px"), F.col("py"), F.col("pz"),
        F.col("vx"), F.col("vy"), F.col("vz"),
    )
    return (
        vc.join(F.broadcast(e), "cell")
        .select("point_id", "corner", c2.alias("c2"), "way_id")
        .groupBy("point_id", "corner")
        .agg(F.min(F.struct("c2", "way_id")).alias("best"))
    )


def knn_nearest_way(
    points: DataFrame,
    resolved_ways: DataFrame,
    level: int | None = 12,
    coarse_level: int | None = None,
) -> DataFrame:
    """points(point_id, lat, lon) × ways(way_id, geom) → (point_id, way_id,
    dist_m). Exact; deterministic ties on way_id. level=None → density-
    adaptive."""
    # verts feed the index build + both escalation scans: persist once (at
    # cluster scale swap for a checkpoint/bucketed materialization)
    verts = _with_xyz(way_vertices(resolved_ways), "vlat", "vlon", "v").persist()
    if level is None:
        level = pick_level(verts)
    coarse_level = coarse_level if coarse_level is not None else max(level - 3, 2)

    index = build_vertex_cell_index(verts, level)

    # tier 1: single-cell equi-join, inline array_min — one row per point
    p = with_grid(
        _with_xyz(points.select("point_id", "lat", "lon"), "lat", "lon", "p"),
        "lat", "lon", level, out="cell",
    )
    c2_of = lambda v: _chord2(
        F.col("px"), F.col("py"), F.col("pz"), v["vx"], v["vy"], v["vz"]
    )
    best = F.array_min(
        F.transform(
            F.col("vs"),
            lambda v: F.struct(c2_of(v).alias("c2"), v["way_id"].alias("way_id")),
        )
    )
    # slim projection persisted: feeds BOTH the accepted output and the
    # escalation anti-branch without recomputing the index join
    t1 = (
        p.join(index, "cell", "left")
        .select(
            "point_id", "lat", "lon", "px", "py", "pz",
            is_corner_cell(F.col("cell"), level).alias("corner"),
            best.alias("best"),
        )
        .persist()
    )
    thr1 = _accept_chord2(level)
    accept1 = (
        F.col("best").isNotNull() & ~F.col("corner") & (F.col("best.c2") < thr1)
    )
    ok1 = t1.filter(accept1).select(
        "point_id",
        F.col("best.way_id").alias("way_id"),
        _chord2_to_m(F.col("best.c2")).alias("dist_m"),
    )

    # tier 2: broadcast escalated points, coarse ring × narrow vertex scan
    esc1 = t1.filter(~accept1).select("point_id", "lat", "lon", "px", "py", "pz")
    t2 = _broadcast_tier(esc1, verts, coarse_level)
    thr2 = _accept_chord2(coarse_level)
    ok2 = t2.filter(~F.col("corner") & (F.col("best.c2") < thr2)).select(
        "point_id",
        F.col("best.way_id").alias("way_id"),
        _chord2_to_m(F.col("best.c2")).alias("dist_m"),
    )

    # tier 3: exact brute tail — broadcast NL join, ONE vertex scan, only
    # ocean-isolated or cube-corner points reach here
    esc2 = esc1.join(ok2.select("point_id"), "point_id", "left_anti")
    c2 = _chord2(
        F.col("px"), F.col("py"), F.col("pz"),
        F.col("vx"), F.col("vy"), F.col("vz"),
    )
    t3 = (
        verts.crossJoin(F.broadcast(esc2.select("point_id", "px", "py", "pz")))
        .select("point_id", c2.alias("c2"), "way_id")
        .groupBy("point_id")
        .agg(F.min(F.struct("c2", "way_id")).alias("best"))
        .select(
            "point_id",
            F.col("best.way_id").alias("way_id"),
            _chord2_to_m(F.col("best.c2")).alias("dist_m"),
        )
    )
    sel = ("point_id", "way_id", "dist_m")
    return ok1.select(*sel).unionByName(ok2.select(*sel)).unionByName(t3.select(*sel))
