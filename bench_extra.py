#!/usr/bin/env python
"""Per-leg isolation harness for optimization round 7 (guide §1.4).

``bench.py`` is FROZEN for measurement; this file exists so individual
legs can be timed/explained in isolation while iterating. Usage::

    python bench_extra.py overlay pip            # time selected legs
    python bench_extra.py --explain overlay      # also dump plans to plans/r07/

Uses the identical session config, fixture staging and timing protocol
(min of 2 warm reps after a cold rep) as bench.py's run_suite, so numbers
are comparable leg-for-leg with the flat bench.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import bench as B  # noqa: E402  (fixture staging + env contract)
from pyspark.sql import functions as F  # noqa: E402

PLANS_DIR = os.path.join(REPO, "plans", "r07")


def _spark():
    from wayproblems_spark.session import get_spark

    return get_spark(
        app_name="wayproblems-bench-extra",
        master=f"local[{B.CPUS}]",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": os.environ.get(
                "SPARK_GRAFT_MAXPART", "4m"
            ),
            "spark.local.dir": os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/tmp"),
            "spark.sql.join.preferSortMergeJoin": "false",
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
        },
    )


def _timed(spark, timings, name, fn, reps=2):
    cold, best = None, None
    out = None
    for r in range(reps + 1):
        spark.sparkContext.setJobDescription(f"{name} rep{r}")
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        if r == 0:
            cold = dt
        else:
            best = dt if best is None else min(best, dt)
    timings[name] = {"warm": round(best, 3), "cold": round(cold, 3)}
    spark.sparkContext.setJobDescription(None)
    return out


def _dump_plan(df, name, suffix):
    os.makedirs(PLANS_DIR, exist_ok=True)
    p = os.path.join(PLANS_DIR, f"{name}_{suffix}.txt")
    with open(p, "w") as f:
        f.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        ))
    print(f"wrote {p}")


def leg_overlay(spark, timings, explain, suffix):
    from wayproblems_spark.operators.overlay import (
        build_overlay_index,
        polygon_intersect_join,
        unpersist_overlay_index,
    )

    ov_a = B.run_suite.__globals__  # noqa: F841 (doc: fixtures come from bench helpers)
    # identical fixture generation to bench.py
    def _overlay_layer(offset_lon, offset_lat, r0, rstep, rmod, name):
        import numpy as _onp
        import pandas as _opd

        nv = 32
        n_poly = 4096
        ang = 2.0 * _onp.pi * _onp.arange(nv + 1) / nv
        i = _onp.arange(n_poly)
        clon = -170.0 + (i % 64) * 2.2 + offset_lon
        clat = -60.0 + (i // 64) * 1.9 + offset_lat
        r = r0 + (i % rmod) * rstep
        rows = []
        for k in range(n_poly):
            lons = clon[k] + r[k] * _onp.cos(ang)
            lats = clat[k] + r[k] * _onp.sin(ang)
            rows.append([{"lon": float(x), "lat": float(y)} for x, y in zip(lons, lats)])
        pdf = _opd.DataFrame({"poly_id": i.astype("int64"), "kind": name, "ring": rows})
        return spark.createDataFrame(
            pdf, "poly_id long, kind string, ring array<struct<lon:double,lat:double>>"
        )

    ov_a = _overlay_layer(0.0, 0.0, 0.8, 0.1, 5, "a")
    ov_b = _overlay_layer(0.9, 0.7, 0.7, 0.08, 7, "b")
    holder = {}

    def _build():
        if "ia" in holder:
            unpersist_overlay_index(holder["ia"])
            unpersist_overlay_index(holder["ib"])
        holder["ia"] = build_overlay_index(spark, ov_a, level=7)
        holder["ib"] = build_overlay_index(spark, ov_b, level=7)
        return sum(f.count() for f in holder["ia"][1:]) + sum(
            f.count() for f in holder["ib"][1:]
        )

    _timed(spark, timings, "overlay_build", _build)

    def _join():
        track = []
        holder["df"] = polygon_intersect_join(
            spark, None, None,
            prebuilt_a=holder["ia"], prebuilt_b=holder["ib"], track_persists=track,
        )
        n = holder["df"].count()
        for df in track:
            df.unpersist()
        return n

    _join()  # warm codegen
    n = _timed(spark, timings, "overlay_join", _join)
    timings["overlay_pairs"] = n
    if explain:
        _dump_plan(holder["df"], "overlay_join", suffix)
    unpersist_overlay_index(holder["ia"])
    unpersist_overlay_index(holder["ib"])


def leg_pip(spark, timings, explain, suffix):
    from wayproblems_spark.operators.pip import (
        build_pip_index,
        point_in_polygon,
        unpersist_pip_index,
    )

    pages_path = B._ensure_bench_corpus(spark)
    knn_in = os.path.join(B.SCRATCH, f"bench_knn_in_{B.BENCH_PAGES}_s42")
    pts = spark.read.parquet(os.path.join(knn_in, "pts"))

    pip_polys = []
    g = 32
    for gy in range(g):
        for gx in range(g):
            cx = 8.0 + (gx + 0.5) * 1.5 / g
            cy = 51.0 + (gy + 0.5) * 1.5 / g
            r = 0.45 * 1.5 / g
            ring = [
                (cx + r * math.cos(a * math.pi / 4.0), cy + r * math.sin(a * math.pi / 4.0))
                for a in range(8)
            ]
            ring.append(ring[0])
            pip_polys.append((gy * g + gx, "grid", ring))
    pip_polys_df = spark.createDataFrame(
        pip_polys, "poly_id long, kind string, ring array<struct<lon:double,lat:double>>"
    )
    holder = {}

    def _build():
        if "idx" in holder:
            unpersist_pip_index(holder["idx"])
        holder["idx"] = build_pip_index(spark, pip_polys_df, level=14, samples=129)
        return g * g

    _timed(spark, timings, "pip_build", _build)

    def _pip():
        holder["df"] = point_in_polygon(spark, pts, None, prebuilt=holder["idx"])
        return holder["df"].count()

    n = _timed(spark, timings, "pip_contains", _pip)
    timings["pip_hits"] = n
    if explain:
        _dump_plan(holder["df"], "pip_contains", suffix)
    unpersist_pip_index(holder["idx"])


def leg_range(spark, timings, explain, suffix):
    from wayproblems_spark.operators.spatial_join import spatial_range_join

    B._ensure_bench_corpus(spark)
    knn_in = os.path.join(B.SCRATCH, f"bench_knn_in_{B.BENCH_PAGES}_s42")
    pts = spark.read.parquet(os.path.join(knn_in, "pts"))
    holder = {}

    def _rj():
        holder["df"] = spatial_range_join(
            pts.select(F.col("point_id").alias("id"), "lat", "lon"), radius_m=150.0
        )
        return holder["df"].count()

    _rj()
    n = _timed(spark, timings, "range_join", _rj)
    timings["range_pairs"] = n
    if explain:
        _dump_plan(holder["df"], "range_join", suffix)


def leg_ann(spark, timings, explain, suffix):
    from wayproblems_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk,
        ivf_train,
    )

    ann_n, ann_dim, ann_lists = 1_000_000, 128, 128
    ann_in = os.path.join(B.SCRATCH, f"bench_ann_in_{ann_n}_{ann_dim}")
    if not os.path.exists(os.path.join(ann_in, "_SUCCESS")):
        B._synth_vectors(spark, ann_n, ann_dim).write.mode("overwrite").parquet(ann_in)
    vecs = spark.read.parquet(ann_in)
    qdf = (
        B._synth_vectors(spark, 64, ann_dim, salt=77)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    )
    centroids = ivf_train(vecs, ann_dim, n_lists=ann_lists, iters=2, sample_fraction=0.02)
    holder = {}

    def _build():
        if "ivf" in holder:
            holder["ivf"][1].unpersist()
        idx = build_ivf_index(vecs, ann_dim, n_lists=ann_lists, centroids=centroids)
        n = idx[1].count()
        holder["ivf"] = idx
        return n

    _timed(spark, timings, "ann_ivf_build", _build)

    def _topk():
        holder["df"] = ivf_topk(
            vecs, qdf, ann_dim, k=10, n_lists=ann_lists, nprobe=8,
            prebuilt=holder["ivf"], rerank="numpy",
        )
        return holder["df"].count()

    n = _timed(spark, timings, "ann_ivf_topk", _topk)
    timings["ann_topk"] = n
    if explain:
        _dump_plan(holder["df"], "ann_ivf_topk", suffix)
    holder["ivf"][1].unpersist()


def leg_minhash(spark, timings, explain, suffix):
    from wayproblems_spark.operators.dedup import minhash_lsh_pairs

    mh_tag = os.path.basename(os.path.normpath(B.SF_DIR))
    mh_path = os.path.join(B.SCRATCH, f"bench_minhash_docs16_{mh_tag}")
    if not os.path.exists(os.path.join(mh_path, "_SUCCESS")):
        d0 = spark.read.parquet(f"{B.SF_DIR}/documents.parquet")
        mh = None
        for c in range(16):
            d = d0.select(
                (F.col("doc_id") + 10_000_000 * c).alias("doc_id"),
                F.regexp_replace(F.col("text"), r"(\S+)", r"$1_" + str(c // 2)).alias("text"),
            )
            mh = d if mh is None else mh.unionByName(d)
        mh.repartition(32, "doc_id").write.mode("overwrite").parquet(mh_path)

    holder = {}

    def _mh():
        tp = []
        holder["df"] = minhash_lsh_pairs(
            spark.read.parquet(mh_path), jaccard_threshold=0.8, track_persists=tp
        )
        n = holder["df"].count()
        for f in tp:
            f.unpersist()
        return n

    _mh()
    n = _timed(spark, timings, "minhash_dedup", _mh)
    timings["minhash_pairs"] = n
    if explain:
        _dump_plan(holder["df"], "minhash_dedup", suffix)


def leg_knn(spark, timings, explain, suffix):
    from wayproblems_spark.operators.knn import build_knn_index, knn_nearest_way

    B._ensure_bench_corpus(spark)
    knn_in = os.path.join(B.SCRATCH, f"bench_knn_in_{B.BENCH_PAGES}_s42")
    knn_ways = spark.read.parquet(os.path.join(knn_in, "ways"))
    pts = spark.read.parquet(os.path.join(knn_in, "pts"))
    holder = {}

    def _build():
        if "idx" in holder:
            _lvl, vg, ix = holder["idx"]
            vg.unpersist()
            ix.unpersist()
        idx = build_knn_index(knn_ways, level=None)
        n = idx[1].count() + idx[2].count()
        holder["idx"] = idx
        return n

    _timed(spark, timings, "knn_build", _build)

    def _knn():
        track = []
        holder["df"] = knn_nearest_way(
            pts, None, prebuilt=holder["idx"], track_persists=track
        )
        n = holder["df"].count()
        for df in track:
            df.unpersist()
        return n

    _knn()
    n = _timed(spark, timings, "knn_assign", _knn)
    timings["knn"] = n
    if explain:
        _dump_plan(holder["df"], "knn_assign", suffix)


def leg_e2e(spark, timings, explain, suffix):
    from wayproblems_spark.operators.resolve import (
        drop_invalid_geometry,
        resolve_locations,
    )
    from wayproblems_spark.rules import problems
    from wayproblems_spark.sources.pages_source import nodes_from_pages, ways_from_pages

    pages_path = B._ensure_bench_corpus(spark)
    pages = spark.read.parquet(pages_path)
    warm = spark.createDataFrame(
        [(1, 1, 1, 1, "w", None, [1, 2], {"highway": "track"})],
        "way_id long, version int, changeset long, uid long, user string, "
        "ts timestamp, nodes array<long>, tags map<string,string>",
    )
    problems(warm).count()
    ways = ways_from_pages(pages).drop("src_url")
    nodes = nodes_from_pages(pages)
    resolved = drop_invalid_geometry(resolve_locations(ways, nodes))
    probs = problems(resolved)
    n = _timed(spark, timings, "wayproblems_e2e", probs.count, reps=2)
    timings["flagged"] = n
    if explain:
        _dump_plan(probs, "wayproblems_e2e", suffix)


LEGS = {
    "overlay": leg_overlay,
    "pip": leg_pip,
    "range": leg_range,
    "ann": leg_ann,
    "minhash": leg_minhash,
    "knn": leg_knn,
    "e2e": leg_e2e,
}


def main():
    args = [a for a in sys.argv[1:]]
    explain = "--explain" in args
    suffix = "after"
    if "--before" in args:
        suffix = "before"
    names = [a for a in args if not a.startswith("--")] or list(LEGS)
    spark = _spark()
    timings: dict = {}
    for n in names:
        LEGS[n](spark, timings, explain, suffix)
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
