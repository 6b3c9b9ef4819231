#!/usr/bin/env python
"""Spatial-enrichment pipeline: the geo operators composed end-to-end.

    spark-submit --py-files wayproblems_spark.zip jobs/spatial_stats.py \
        --points /data/points_parquet --layer /data/admin.geojson \
        --out /data/spatial [--level 10] [--value-cols score,weight] \
        [--layer-b /data/landuse.geojson] [--kind-property kind]

One pass over a point table (point_id, lat, lon[, value columns...])
against a GeoJSON polygon layer, producing the standard spatial
rollup artifacts:

  out/assignments/  (point_id, poly_id, kind) — G4 containment join
  out/zonal/        per-(poly_id, kind) aggregates of --value-cols
                    (decimal-accumulated sums, exact min/max, null-aware
                    avg) plus n_points                 [q56 oracle]
  out/overlay/      (a_id, b_id) intersecting pairs vs --layer-b
                    (only when a second layer is given) [q55 oracle]
  out/stats.json    row counts per artifact

The polygon index is built ONCE (`build_pip_index`, persisted) and the
G4 containment join runs ONCE: the zonal aggregate reuses the written
assignments (`zonal_stats(hits=)`) instead of re-running the ray cast —
the prebuilt-index stance that fixed the r4 pip scaling leg, extended
to the result; overlay builds its own per-layer indexes the same way.
Points never shuffle until the zonal aggregate, whose cardinality is
the polygon count.

Path contract: parquet artifacts go through Spark and accept any
Hadoop filesystem; `stats.json` is written driver-local (same contract
as curate_corpus / the dedup-stream state dirs) — give `--out` a
driver-visible POSIX/DBFS-fuse path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", required=True, help="parquet of points")
    ap.add_argument("--layer", required=True, help="GeoJSON polygon layer")
    ap.add_argument("--out", required=True)
    ap.add_argument("--level", type=int, default=10, help="S2 bucket level")
    ap.add_argument("--value-cols", default="",
                    help="comma-separated numeric point columns for zonal")
    ap.add_argument("--layer-b", default="",
                    help="second GeoJSON layer; emits the overlay "
                         "intersects join against --layer")
    ap.add_argument("--kind-property", default="kind")
    ap.add_argument("--id-col", default="point_id")
    ap.add_argument("--lat-col", default="lat")
    ap.add_argument("--lon-col", default="lon")
    ap.add_argument("--cpus", type=int, default=0)
    args = ap.parse_args(argv)

    from wayproblems_spark.operators.overlay import (
        build_overlay_index,
        polygon_intersect_join,
        unpersist_overlay_index,
    )
    from wayproblems_spark.operators.pip import (
        build_pip_index,
        point_in_polygon,
        unpersist_pip_index,
    )
    from wayproblems_spark.operators.zonal import zonal_stats
    from wayproblems_spark.session import get_spark
    from wayproblems_spark.sources.geojson import read_geojson_polygons

    spark = get_spark(
        app_name="spatial-stats",
        master=f"local[{args.cpus}]" if args.cpus else None,
    )
    points = spark.read.parquet(args.points)
    polys = read_geojson_polygons(
        spark, args.layer, kind_property=args.kind_property
    )
    value_cols = tuple(c for c in args.value_cols.split(",") if c)

    index = build_pip_index(spark, polys, args.level, persist=True)
    stats = {}
    kw = dict(
        id_col=args.id_col, lat_col=args.lat_col, lon_col=args.lon_col,
        prebuilt=index,
    )
    assignments = point_in_polygon(spark, points, None, **kw)
    assignments.write.mode("overwrite").parquet(
        os.path.join(args.out, "assignments")
    )
    # the containment join is the job's dominant cost — re-read the
    # written assignments and feed them to zonal via hits= so G4 runs
    # exactly once over the point table
    hits = spark.read.parquet(os.path.join(args.out, "assignments"))
    stats["assignments"] = hits.count()

    zonal = zonal_stats(
        spark, points, None, value_cols=value_cols, hits=hits, **kw
    )
    zonal.write.mode("overwrite").parquet(os.path.join(args.out, "zonal"))
    stats["zonal"] = spark.read.parquet(os.path.join(args.out, "zonal")).count()
    unpersist_pip_index(index)

    if args.layer_b:
        polys_b = read_geojson_polygons(
            spark, args.layer_b, kind_property=args.kind_property
        )
        ia = build_overlay_index(spark, polys, args.level)
        ib = build_overlay_index(spark, polys_b, args.level)
        overlay = polygon_intersect_join(
            spark, None, None, prebuilt_a=ia, prebuilt_b=ib
        )
        overlay.write.mode("overwrite").parquet(
            os.path.join(args.out, "overlay")
        )
        stats["overlay"] = spark.read.parquet(
            os.path.join(args.out, "overlay")
        ).count()
        unpersist_overlay_index(ia)
        unpersist_overlay_index(ib)

    with open(os.path.join(args.out, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
