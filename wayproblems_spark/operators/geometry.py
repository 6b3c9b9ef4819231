"""Geometry measures over resolved way/polygon frames — length and area.

Both are pure column-expression pipelines (explode → codegen per-segment
math → aggregate), with one deliberate numerical choice: per-segment
values are cast to ``decimal(38,10)`` BEFORE summing, so the per-feature
total is exact and ORDER-INSENSITIVE — the same trick the q01 oracle
uses. A double sum would depend on partition/evaluation order and could
not be compared bit-exactly against an independent SQL oracle (or against
the same job at another parallelism — the north rule's bit-stability
clause).

* ``way_length_m`` — polyline length: haversine per consecutive vertex
  pair (EARTH_RADIUS_M, the kNN module's constant), decimal sum per way.
* ``ring_area_m2`` — small-polygon area: planar shoelace over an
  equirectangular projection anchored at each ring's mean latitude
  (x = R·λ·cos φ̄, y = R·φ). Exact for the admin/landuse scale the
  pipeline carries (error O((span/R)²)); the approximation is stated, not
  hidden — a spherical-excess variant would not change the plan shape.

Scale: one explode (segments/edges ≈ input vertices) → map-side partial
decimal sum → one shuffle on the feature id. No Python anywhere.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd  # module-level: pandas_udf hint strings resolve here

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .knn import EARTH_RADIUS_M

_DEC = "decimal(38,10)"


def _segments(df: DataFrame, id_col: str, geom_col: str) -> DataFrame:
    """(id, a struct, b struct) per consecutive vertex pair."""
    n = F.size(geom_col)
    pairs = F.arrays_zip(
        F.slice(F.col(geom_col), 1, n - 1).alias("a"),
        F.slice(F.col(geom_col), 2, n - 1).alias("b"),
    )
    return df.select(F.col(id_col), F.explode(pairs).alias("s")).select(
        id_col,
        F.col("s.a.lon").alias("ax"), F.col("s.a.lat").alias("ay"),
        F.col("s.b.lon").alias("bx"), F.col("s.b.lat").alias("by"),
    )


def _haversine_m(ax, ay, bx, by):
    dphi = F.radians(by - ay) / 2.0
    dlam = F.radians(bx - ax) / 2.0
    h = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(ay)) * F.cos(F.radians(by)) * F.sin(dlam) * F.sin(dlam)
    )
    return 2.0 * EARTH_RADIUS_M * F.asin(F.sqrt(h))


def way_length_m(
    resolved_ways: DataFrame, id_col: str = "way_id", geom_col: str = "geom"
) -> DataFrame:
    """(way_id, length_m double) — polyline haversine length; single-vertex
    ways get 0.0. Decimal-accumulated (order-insensitive, oracle-exact)."""
    seg = _segments(resolved_ways, id_col, geom_col)
    d = _haversine_m(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"))
    summed = (
        seg.select(id_col, d.cast(_DEC).alias("d"))
        .groupBy(id_col)
        .agg(F.sum("d").cast("double").alias("length_m"))
    )
    return (
        resolved_ways.select(id_col)
        .join(summed, id_col, "left")
        .select(id_col, F.coalesce("length_m", F.lit(0.0)).alias("length_m"))
    )


def ring_area_m2(
    polys: DataFrame, id_col: str = "poly_id", ring_col: str = "ring"
) -> DataFrame:
    """(poly_id, area_m2 double) — |shoelace| over the equirectangular
    projection at the ring's mean latitude. Ring must be closed
    (first == last vertex); orientation-independent via abs.

    Two passes joined on the poly id: the edge 'a' vertices of a closed
    ring enumerate exactly the open ring, so the mean latitude is a plain
    decimal-sum/count over the same exploded segment frame (no
    interpreted array fold, and the decimal→double/double division is
    bit-replicable in the SQL oracle)."""
    seg = _segments(polys, id_col, ring_col)
    lat0 = seg.groupBy(id_col).agg(
        (
            F.sum(F.col("ay").cast(_DEC)).cast("double")
            / F.count("*").cast("double")
        ).alias("_lat0")
    )
    s2 = seg.join(lat0, id_col)
    k = math.pi / 180.0 * EARTH_RADIUS_M
    cos0 = F.cos(F.radians("_lat0"))
    px = F.col("ax") * cos0 * k
    py = F.col("ay") * k
    qx = F.col("bx") * cos0 * k
    qy = F.col("by") * k
    cross = (px * qy - qx * py).cast(_DEC)
    return (
        s2.select(id_col, cross.alias("c"))
        .groupBy(id_col)
        .agg(
            # /2 after the double cast: exact (power of two), and avoids
            # engine-specific decimal-division scale rules in the oracle
            (F.abs(F.sum("c").cast("double")) / 2.0).alias("area_m2")
        )
    )


def simplify_ways(
    ways: DataFrame,
    tolerance_m: float,
    id_col: str = "way_id",
    geom_col: str = "geom",
) -> DataFrame:
    """Douglas-Peucker polyline simplification per way (the tile-rendering
    / storage-reduction companion to the measures above): returns the
    input frame with ``geom_col`` replaced by the simplified vertex list
    (original coordinate values, endpoints always kept).

    Metric: 3D point-to-segment distance on unit-sphere chords — within
    O((tol/R)^2) of the great-circle distance, exact enough for any
    rendering tolerance, and trig-free inside the recursion (one
    lat/lon→xyz conversion per vertex). Deterministic: numpy first-match
    argmax picks the split vertex, so ties resolve identically on every
    run/partitioning.

    Scale shape: one Arrow-batched pandas UDF, one row per way, no
    shuffle, no driver involvement — ways are short (the resolver caps
    vertex counts), so the per-row iterative stack is O(n log n) typical
    on tiny n while rows distribute freely. This is the documented
    "genuinely can't express in built-ins" case (per-feature recursive
    split), not a hot-path scalar loop."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        StructField,
        StructType,
    )

    tol_arc = tolerance_m / EARTH_RADIUS_M
    tol_chord = 2.0 * math.sin(tol_arc / 2.0)
    tol2 = tol_chord * tol_chord
    ret = ArrayType(
        StructType(
            [StructField("lon", DoubleType()), StructField("lat", DoubleType())]
        )
    )

    def _dp_mask(p: "np.ndarray") -> "np.ndarray":
        n = len(p)
        keep = np.zeros(n, dtype=bool)
        keep[0] = keep[-1] = True
        stack = [(0, n - 1)]
        while stack:
            i, j = stack.pop()
            if j <= i + 1:
                continue
            a, b = p[i], p[j]
            mid = p[i + 1 : j]
            ab = b - a
            ab2 = float(ab @ ab)
            if ab2 == 0.0:
                d2 = ((mid - a) ** 2).sum(axis=1)
            else:
                t = np.clip((mid - a) @ ab / ab2, 0.0, 1.0)
                d2 = ((mid - (a + t[:, None] * ab)) ** 2).sum(axis=1)
            kmax = int(np.argmax(d2))  # first max — deterministic ties
            if d2[kmax] > tol2:
                k = i + 1 + kmax
                keep[k] = True
                stack.append((i, k))
                stack.append((k, j))
        return keep

    @pandas_udf(ret)
    def _simp(geoms: pd.Series) -> pd.Series:
        out = []
        for g in geoms:
            if g is None or len(g) <= 2:
                out.append(g)
                continue
            lon = np.array([v["lon"] for v in g], dtype=np.float64)
            lat = np.array([v["lat"] for v in g], dtype=np.float64)
            rl, rn = np.radians(lat), np.radians(lon)
            p = np.stack(
                [np.cos(rl) * np.cos(rn), np.cos(rl) * np.sin(rn), np.sin(rl)],
                axis=1,
            )
            keep = _dp_mask(p)
            out.append(
                [
                    {"lon": float(lon[i]), "lat": float(lat[i])}
                    for i in np.flatnonzero(keep)
                ]
            )
        return pd.Series(out)

    return ways.withColumn(geom_col, _simp(F.col(geom_col)))


def resample_ways(
    ways: DataFrame,
    spacing_m: float,
    id_col: str = "way_id",
    geom_col: str = "geom",
) -> DataFrame:
    """Fixed-spacing polyline resampling — the map-matching / trajectory
    prep companion to :func:`simplify_ways`: emit a point every
    ``spacing_m`` meters of arc length along each way, plus the final
    endpoint. Returns ``(id_col, seq, lon, lat)`` with ``seq`` the
    0-based sample index (sample k sits at exactly k*spacing of arc;
    the last row is always the way's final vertex).

    Geometry: per-segment great-circle interpolation (slerp on unit-
    sphere xyz, one trig conversion per vertex); segment arcs from the
    exact chord→arc relation 2·asin(|Δp|/2). Zero-length segments carry
    no arc and are stepped over deterministically (searchsorted side
    'right'), so duplicate vertices never divide by zero.

    Scale shape: one Arrow-batched pandas UDF producing the sample array
    per way + a posexplode — no shuffle, no driver involvement; output
    multiplicity is len/spacing, the same explode-inside-scan shape the
    tile and chunking operators use. Per-feature arc-parameterized
    interpolation is the documented can't-express-in-built-ins case
    (like the DP recursion above), hence the UDF."""
    if spacing_m <= 0:
        raise ValueError(f"spacing_m must be positive, got {spacing_m}")
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        StructField,
        StructType,
    )

    spacing_arc = spacing_m / EARTH_RADIUS_M
    ret = ArrayType(
        StructType(
            [StructField("lon", DoubleType()), StructField("lat", DoubleType())]
        )
    )

    def _resample_one(lon: "np.ndarray", lat: "np.ndarray") -> list:
        rl, rn = np.radians(lat), np.radians(lon)
        p = np.stack(
            [np.cos(rl) * np.cos(rn), np.cos(rl) * np.sin(rn), np.sin(rl)],
            axis=1,
        )
        chord = np.linalg.norm(np.diff(p, axis=0), axis=1)
        arc = 2.0 * np.arcsin(np.clip(chord / 2.0, 0.0, 1.0))
        cum = np.concatenate([[0.0], np.cumsum(arc)])
        total = float(cum[-1])
        if total == 0.0:
            return [{"lon": float(lon[0]), "lat": float(lat[0])},
                    {"lon": float(lon[-1]), "lat": float(lat[-1])}]
        n_k = int(total / spacing_arc)
        targets = spacing_arc * np.arange(0, n_k + 1, dtype=np.float64)
        seg = np.clip(
            np.searchsorted(cum, targets, side="right") - 1, 0, len(arc) - 1
        )
        # step over zero-length segments: side='right' already lands each
        # target on the first segment whose cum range contains it
        theta = arc[seg]
        with np.errstate(invalid="ignore", divide="ignore"):
            f = np.where(theta > 0.0, (targets - cum[seg]) / theta, 0.0)
        a, b = p[seg], p[seg + 1]
        st = np.sin(theta)
        wa = np.where(theta > 0.0, np.sin((1.0 - f) * theta), 1.0)
        wb = np.where(theta > 0.0, np.sin(f * theta), 0.0)
        denom = np.where(st > 0.0, st, 1.0)
        q = (wa[:, None] * a + wb[:, None] * b) / denom[:, None]
        out_lon = np.degrees(np.arctan2(q[:, 1], q[:, 0]))
        out_lat = np.degrees(
            np.arctan2(q[:, 2], np.hypot(q[:, 0], q[:, 1]))
        )
        pts = [
            {"lon": float(x), "lat": float(y)}
            for x, y in zip(out_lon, out_lat)
        ]
        pts.append({"lon": float(lon[-1]), "lat": float(lat[-1])})
        return pts

    @pandas_udf(ret)
    def _res(geoms: pd.Series) -> pd.Series:
        out = []
        for g in geoms:
            if g is None or len(g) == 0:
                out.append(None)
                continue
            if len(g) == 1:
                v = {"lon": float(g[0]["lon"]), "lat": float(g[0]["lat"])}
                out.append([v, v])
                continue
            lon = np.array([v["lon"] for v in g], dtype=np.float64)
            lat = np.array([v["lat"] for v in g], dtype=np.float64)
            out.append(_resample_one(lon, lat))
        return pd.Series(out)

    return (
        ways.select(F.col(id_col), _res(F.col(geom_col)).alias("_pts"))
        .filter(F.col("_pts").isNotNull())
        .select(
            id_col, F.posexplode("_pts").alias("seq", "_p")
        )
        .select(
            id_col,
            F.col("seq").cast("long").alias("seq"),
            F.col("_p.lon").alias("lon"),
            F.col("_p.lat").alias("lat"),
        )
    )
