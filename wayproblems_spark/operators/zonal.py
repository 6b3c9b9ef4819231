"""Zonal statistics — per-polygon aggregates over a point layer.

The tile/admin rollup the reference renders per admin area
(wayproblems' per-layer problem counts, sinks/meta.py popup counts),
generalized: assign each point to its containing polygons with the
oracle-locked G4 ray cast (operators/pip.py, q15/q20 hash-exact), then
aggregate point payloads per (poly_id, kind).

Numeric discipline: double SUM/AVG over a group is accumulation-order
dependent (Spark's partial aggregates vs any serial engine), so sums
accumulate in decimal(38,6) — exact and order-insensitive for payloads
with ≤6 fractional digits — and avg is derived from the decimal sum by
one final double division. min/max/count are exact as-is.

100 TB shape: identical to G4 — the polygon index broadcasts (pass a
persisted ``build_pip_index`` result via ``prebuilt=`` to amortize it
across calls), the point side never shuffles until the final aggregate
on (poly_id, kind), whose cardinality is the polygon count, not the
point count. Map-side partial aggregation collapses each task's points
before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pip import point_in_polygon

__all__ = ["zonal_stats", "zonal_partials"]


def zonal_partials(
    spark,
    points: DataFrame,
    polys: DataFrame | None,
    value_cols: tuple[str, ...] = (),
    level: int = 10,
    id_col: str = "point_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    samples: int | None = None,
    prebuilt=None,
    hits: DataFrame | None = None,
) -> DataFrame:
    """(poly_id, kind, n_points[, <v>_sum, <v>_cnt, <v>_min, <v>_max ...])
    — the COMBINABLE partial form of :func:`zonal_stats`: every final
    statistic is a fold of these (Σn, Σsum exact in decimal, Σcnt,
    min-of-mins, max-of-maxes), which is what the streaming rollup
    (streaming/zonal_stream.py) writes per micro-batch. Pass ``hits=``
    (a precomputed `point_in_polygon` result) to skip the containment
    join when the caller already materialized it."""
    if hits is None:
        hits = point_in_polygon(
            spark,
            points,
            polys,
            level=level,
            id_col=id_col,
            lat_col=lat_col,
            lon_col=lon_col,
            samples=samples,
            prebuilt=prebuilt,
        )
    # join back only what the aggregate needs — a points frame carrying
    # its own `kind`/`poly_id` columns must not collide with the hit
    # frame's (the G4 contract reserves those names on the polygon side)
    payload = points.select(id_col, *value_cols)
    joined = hits.join(payload, id_col)
    aggs = [F.count(F.lit(1)).alias("n_points")]
    for v in value_cols:
        aggs += [
            F.sum(F.col(v).cast("decimal(38,6)")).alias(f"{v}_sum"),
            # the NON-NULL count — avg divides by this (SQL AVG
            # semantics); n_points counts every contained point
            F.count(F.col(v)).alias(f"{v}_cnt"),
            F.min(F.col(v)).alias(f"{v}_min"),
            F.max(F.col(v)).alias(f"{v}_max"),
        ]
    return joined.groupBy("poly_id", "kind").agg(*aggs)


def zonal_stats(
    spark,
    points: DataFrame,
    polys: DataFrame | None,
    value_cols: tuple[str, ...] = (),
    level: int = 10,
    id_col: str = "point_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    samples: int | None = None,
    prebuilt=None,
    hits: DataFrame | None = None,
) -> DataFrame:
    """(poly_id, kind, n_points[, <v>_sum, <v>_min, <v>_max, <v>_avg ...]).

    Polygons containing no points are absent — left-join the polygon
    frame downstream for zero rows. ``id_col`` must be unique per point
    (the G4 parity contract). ``value_cols`` are numeric point columns;
    each contributes decimal-accumulated sum, exact min/max, and an avg
    derived from the decimal sum over the non-null count. ``hits=``
    reuses a precomputed containment join (jobs/spatial_stats.py writes
    assignments and aggregates them without running G4 twice)."""
    out = zonal_partials(
        spark, points, polys, value_cols, level, id_col, lat_col, lon_col,
        samples, prebuilt, hits,
    )
    for v in value_cols:
        out = out.withColumn(
            f"{v}_avg",
            F.col(f"{v}_sum").cast("double") / F.col(f"{v}_cnt"),
        ).drop(f"{v}_cnt")
    return out
