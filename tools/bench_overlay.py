"""Standalone 2v8 scaling measurement for polygon_intersect_join.

Kept OUT of bench.py so the round's driver-bench leg set (and its
r6a-r6d protocol evidence) stays comparable; results are recorded in
BENCH/BASELINE.md. Protocol mirrors bench.py --scaling: identical
staged input, fresh JVM per parallelism level (spawned child), warm =
min of 2 in-process reps, pair-count fingerprint asserted identical
across levels.

Fixture: two 8,192-polygon layers of 64-gons on a 128x64 lattice —
few polygons, MANY edges, so the decision stage (candidate pairs x
64x64 edge orientation tests, ~80M codegen rows) dominates and the
leg is compute-bound, not scheduler-bound. Index build (driver-side
covers + broadcast persist) is excluded from timing: the prebuilt
stance, same as the pip/knn legs.

    python tools/bench_overlay.py            # runs 2 then 8 cores
    SPARK_OVERLAY_CPUS=8 python tools/bench_overlay.py --child  # one level
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

P = 8192
NV = 64
# fixture params are part of the stage path (ADVICE r6): editing P/NV
# used to silently reuse stale staged data behind the _SUCCESS check
STAGE = f"/dev/shm/spark_graft_overlay_{P}_{NV}"


def _gen(spark):
    import numpy as np
    import pandas as pd

    if os.path.exists(os.path.join(STAGE, "a", "_SUCCESS")) and os.path.exists(
        os.path.join(STAGE, "b", "_SUCCESS")
    ):
        return
    ang = 2.0 * np.pi * np.arange(NV + 1) / NV  # closed ring

    def layer(offset_lon, offset_lat, r0, rstep, rmod, name):
        i = np.arange(P)
        clon = -170.0 + (i % 128) * 2.2 + offset_lon
        clat = -60.0 + (i // 128) * 1.9 + offset_lat
        r = r0 + (i % rmod) * rstep
        rows = []
        for k in range(P):
            lons = clon[k] + r[k] * np.cos(ang)
            lats = clat[k] + r[k] * np.sin(ang)
            rows.append(
                [{"lon": float(x), "lat": float(y)} for x, y in zip(lons, lats)]
            )
        pdf = pd.DataFrame(
            {"poly_id": i.astype("int64"), "kind": name, "ring": rows}
        )
        spark.createDataFrame(
            pdf,
            "poly_id long, kind string, ring array<struct<lon:double,lat:double>>",
        ).coalesce(4).write.mode("overwrite").parquet(os.path.join(STAGE, name))

    layer(0.0, 0.0, 0.8, 0.1, 5, "a")
    layer(0.9, 0.7, 0.7, 0.08, 7, "b")


def run_level(cpus: int) -> dict:
    from wayproblems_spark.operators.overlay import (
        build_overlay_index,
        polygon_intersect_join,
    )
    from wayproblems_spark.session import get_spark

    spark = get_spark(
        app_name=f"overlay-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=4 * cpus,
    )
    _gen(spark)
    pa = spark.read.parquet(os.path.join(STAGE, "a"))
    pb = spark.read.parquet(os.path.join(STAGE, "b"))
    t0 = time.time()
    ia = build_overlay_index(spark, pa, level=7)
    ib = build_overlay_index(spark, pb, level=7)
    build_s = time.time() - t0

    times, pairs = [], None
    for _ in range(2):
        # each rep calls polygon_intersect_join afresh -> new DataFrame
        # lineage, so no cross-rep shuffle-stage reuse; the persisted
        # index frames ARE meant to come from cache (prebuilt stance)
        t0 = time.time()
        n = polygon_intersect_join(
            spark, None, None, prebuilt_a=ia, prebuilt_b=ib
        ).count()
        times.append(time.time() - t0)
        pairs = n
    spark.stop()
    return {
        "cpus": cpus,
        "build_s": round(build_s, 3),
        "warm_s": round(min(times), 3),
        "cold_s": round(times[0], 3),
        "pairs": pairs,
    }


def main():
    if "--child" in sys.argv:
        cpus = int(os.environ["SPARK_OVERLAY_CPUS"])
        print("CHILD_RESULT " + json.dumps(run_level(cpus)))
        return
    results = {}
    for cpus in (2, 8):
        env = dict(os.environ, SPARK_OVERLAY_CPUS=str(cpus))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("CHILD_RESULT ")]
        if not line:
            print(out.stdout[-2000:], out.stderr[-2000:])
            raise SystemExit(f"child {cpus} failed")
        results[cpus] = json.loads(line[-1][len("CHILD_RESULT "):])
        print(cpus, results[cpus])
    assert results[2]["pairs"] == results[8]["pairs"], "fingerprint mismatch"
    eff = results[2]["warm_s"] / results[8]["warm_s"] / 4.0
    print(json.dumps({
        "metric": "overlay_scaling_2v8", "pairs": results[2]["pairs"],
        "warm_2": results[2]["warm_s"], "warm_8": results[8]["warm_s"],
        "efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
