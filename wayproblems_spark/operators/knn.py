"""G5 — kNN nearest-way assignment (exact, bit-stable across parallelism).

Semantics: for each point, the nearest way measured as the minimum haversine
distance to any of the way's vertices, tie-broken by smallest way_id —
a total order, so results are identical regardless of cluster size or
partitioning (the north_rule bit-stability clause).

Physical plan (tiered, all JVM-side except the numpy cell encoder):

  tier 1: equi-join point 3×3-cell-neighborhood × way-vertex cell at
          `level` (ring join); min(struct(dist, way_id)) per point.
          A tier-1 best is PROVABLY exact when best_dist < the minimum
          distance from the point to its 3×3 neighborhood border; we use
          the conservative bound one-cell-width (the S2 cell's minimum
          edge length at `level`).
  tier 2: unresolved/unproven points escalate to `level-4` (16× coarser),
          same join + same acceptance bound.
  tier 3: brute-force cross join for the (rare) remainder — exact by
          construction.

Distances: haversine on a spherical earth, computed per candidate pair with
built-in column math (no accumulation → no float reduction-order
dependence). min(struct(...)) is order-insensitive → deterministic.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cells import MAX_LEVEL, neighbor_grid_ids, with_grid

EARTH_RADIUS_M = 6371008.8

# Minimum S2 cell edge length at level L (kMinEdge ≈ 2*sqrt(2)/3 / 2^L
# radians ≈ 0.943/2^L). A point's 3×3 neighborhood border is at least one
# full min-edge away, so best_dist < cell_min_edge_m(level) proves tier
# exactness.
_MIN_EDGE_RAD = 2.0 * math.sqrt(2.0) / 3.0


def cell_min_edge_m(level: int) -> float:
    return _MIN_EDGE_RAD / (1 << level) * EARTH_RADIUS_M


def haversine_m(lat1, lon1, lat2, lon2):
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1) / 2.0
    dlam = F.radians(lon2 - lon1) / 2.0
    a = F.sin(dphi) ** 2 + F.cos(rl1) * F.cos(rl2) * F.sin(dlam) ** 2
    return 2.0 * EARTH_RADIUS_M * F.asin(F.sqrt(a))


def _with_xyz(df: DataFrame, lat_col: str, lon_col: str, prefix: str) -> DataFrame:
    """Unit-sphere XYZ — trig once per ROW so the candidate join needs none."""
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
    """Squared 3D chord length — strictly monotonic in great-circle
    distance, so min(struct(chord2, way_id)) picks the same winner as the
    haversine, with zero trig per candidate pair."""
    dx, dy, dz = px - vx, py - vy, pz - vz
    return dx * dx + dy * dy + dz * dz


def _chord2_to_m(c2):
    return 2.0 * EARTH_RADIUS_M * F.asin(F.sqrt(c2) / 2.0)


def way_vertices(resolved_ways: DataFrame) -> DataFrame:
    """Explode resolved geometries to (way_id, vlat, vlon)."""
    return resolved_ways.select(
        "way_id", F.explode("geom").alias("v")
    ).select("way_id", F.col("v.lat").alias("vlat"), F.col("v.lon").alias("vlon"))


def _best_candidates(pts: DataFrame, verts_cells: DataFrame, level: int) -> DataFrame:
    """One tier: ring join + per-point min(struct(chord2, way_id)).

    The point side carries ONE grid-encode UDF; the 3×3 ring expansion is
    JVM bit arithmetic (neighbor_grid_ids); the pair distance is a
    trig-free squared chord (monotonic with haversine) converted to meters
    only for the single per-point winner."""
    p = _with_xyz(with_grid(pts, "lat", "lon", level, out="g"), "lat", "lon", "p")
    p = p.select(
        "point_id", "px", "py", "pz",
        F.explode(neighbor_grid_ids(F.col("g"), level)).alias("cell"),
    )
    cand = p.join(verts_cells, "cell")
    c2 = _chord2(
        F.col("px"), F.col("py"), F.col("pz"),
        F.col("vx"), F.col("vy"), F.col("vz"),
    )
    return (
        cand.select("point_id", "way_id", c2.alias("c2"))
        .groupBy("point_id")
        .agg(F.min(F.struct("c2", "way_id")).alias("best"))
        .select(
            "point_id",
            F.col("best.way_id").alias("way_id"),
            _chord2_to_m(F.col("best.c2")).alias("dist_m"),
        )
    )


def pick_level(verts: DataFrame, probe_level: int = 12, target_occupancy: int = 4) -> int:
    """Density-adaptive cell level: probe occupancy at `probe_level`, then
    adjust so the mean verts-per-cell ≈ target. Keeps the ring-join
    candidate count ~O(points · 9 · target) instead of growing
    quadratically with density (the 100TB-scale guard)."""
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


def knn_nearest_way(
    points: DataFrame,
    resolved_ways: DataFrame,
    level: int | None = 12,
    coarse_level: int | None = None,
) -> DataFrame:
    """points(point_id, lat, lon) × ways(way_id, geom) → (point_id, way_id,
    dist_m). Exact; deterministic ties on way_id. level=None → density-
    adaptive."""
    # both tiers + the brute tail reuse these: persist once (at cluster scale
    # swap for a checkpoint/bucketed materialization)
    verts = _with_xyz(way_vertices(resolved_ways), "vlat", "vlon", "v").persist()
    if level is None:
        level = pick_level(verts)
    coarse_level = coarse_level if coarse_level is not None else max(level - 2, 1)
    vfine = with_grid(verts, "vlat", "vlon", level, out="cell")
    vcoarse = with_grid(verts, "vlat", "vlon", coarse_level, out="cell")

    pts = points.select("point_id", "lat", "lon").persist()

    # persist each tier: its rows feed both the accepted output and the
    # next tier's anti-join — without this the expensive join runs twice
    t1 = _best_candidates(pts, vfine, level).persist()
    ok1 = t1.filter(F.col("dist_m") < cell_min_edge_m(level))

    rest1 = pts.join(ok1.select("point_id"), "point_id", "left_anti")
    t2 = _best_candidates(rest1, vcoarse, coarse_level).persist()
    ok2 = t2.filter(F.col("dist_m") < cell_min_edge_m(coarse_level))

    rest2 = rest1.join(ok2.select("point_id"), "point_id", "left_anti")
    # tier 3: brute force the stragglers (crossJoin; small by construction)
    p3 = _with_xyz(rest2, "lat", "lon", "p")
    c2 = _chord2(
        F.col("px"), F.col("py"), F.col("pz"),
        F.col("vx"), F.col("vy"), F.col("vz"),
    )
    t3 = (
        p3.crossJoin(verts)
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
