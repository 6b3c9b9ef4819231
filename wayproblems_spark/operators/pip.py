"""G4 — point-in-polygon via broadcast cell-prefix join + JVM ray cast.

Physical plan (SURVEY.md §2.1 G4): the polygon layer is small relative to
the point side (admin/landuse boundaries vs billions of points), so we

  1. driver-side: cover each polygon's bbox with S2 cells at `level`
     (STRtree-analog bucketing), explode to (cell, poly) pairs,
  2. **broadcast** that bucket table and equi-join on the point's cell —
     no shuffle of the big side, and
  3. run the exact ray-cast test *JVM-side* with a higher-order
     ``aggregate`` over the ring's edge list — no Python in the hot path.

Tie rule: a point exactly on a polygon edge counts as INSIDE
(FIXTURES.md §4), implemented as an explicit on-edge test with eps=1e-12
on the cross product (degree-space).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .cells import covering_cells, with_cell

EPS = 1e-12


def polygon_cell_buckets(spark, polys: DataFrame, level: int) -> DataFrame:
    """(cell, poly_id, kind, ring) — driver-computed covering cells.

    The polygon layer is collected to the driver (assumption: 10^2..10^5
    polygons — the broadcast side); covering is vectorized numpy.
    """
    rows = polys.collect()
    out = []
    for r in rows:
        ring = [(p["lon"], p["lat"]) for p in r["ring"]]
        lons = [p[0] for p in ring]
        lats = [p[1] for p in ring]
        for cell in covering_cells(min(lons), min(lats), max(lons), max(lats), level):
            out.append((int(cell), r["poly_id"], r["kind"], ring))
    return spark.createDataFrame(
        out,
        "cell long, poly_id long, kind string, ring array<struct<lon:double,lat:double>>",
    )


def _ray_cast(px: Column, py: Column, ring: Column) -> Column:
    """struct(inside boolean) — even-odd rule + boundary-inside.

    Edges are consecutive ring vertex pairs; the ring is closed (first ==
    last) so edges = zip(ring[:-1], ring[1:]).
    """
    n = F.size(ring)
    a = F.slice(ring, 1, n - 1)
    b = F.slice(ring, 2, n - 1)
    edges = F.arrays_zip(a.alias("a"), b.alias("b"))

    def step(acc, e):
        ax, ay = e["a"]["lon"], e["a"]["lat"]
        bx, by = e["b"]["lon"], e["b"]["lat"]
        # crossing: edge straddles the horizontal line through py, and the
        # intersection x is strictly right of px
        straddles = (ay > py) != (by > py)
        xint = (bx - ax) * (py - ay) / (by - ay) + ax
        crossing = straddles & (px < xint)
        # on-edge: collinear + within bbox
        cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        on_edge = (
            (F.abs(cross) < EPS)
            & (px >= F.least(ax, bx) - EPS)
            & (px <= F.greatest(ax, bx) + EPS)
            & (py >= F.least(ay, by) - EPS)
            & (py <= F.greatest(ay, by) + EPS)
        )
        return F.struct(
            # boolean != is XOR (even-odd rule)
            (acc["inside"] != F.coalesce(crossing, F.lit(False))).alias("inside"),
            (acc["edge"] | F.coalesce(on_edge, F.lit(False))).alias("edge"),
        )

    acc0 = F.struct(F.lit(False).alias("inside"), F.lit(False).alias("edge"))
    res = F.aggregate(edges, acc0, step)
    return res["inside"] | res["edge"]


def point_in_polygon(
    spark,
    points: DataFrame,
    polys: DataFrame,
    level: int = 10,
    id_col: str = "point_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """point_id → poly_id (one row per containing polygon; points in no
    polygon are absent — left-join downstream if needed)."""
    pts = with_cell(points, lat_col, lon_col, level, out="cell")
    buckets = polygon_cell_buckets(spark, polys, level)
    cand = pts.join(F.broadcast(buckets), "cell")
    hit = cand.filter(_ray_cast(F.col(lon_col), F.col(lat_col), F.col("ring")))
    return hit.select(id_col, "poly_id", "kind")
