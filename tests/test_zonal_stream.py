"""Streaming zonal rollup: totals over micro-batches == one-shot
zonal_stats on the concatenated points (exact, incl. decimal sums and
null-aware avg), replay-idempotent through the batch_id partitions."""

from __future__ import annotations

import os
import time

from wayproblems_spark.operators.pip import build_pip_index, unpersist_pip_index
from wayproblems_spark.operators.zonal import zonal_stats
from wayproblems_spark.streaming.zonal_stream import (
    zonal_foreach_batch,
    zonal_totals,
)

from tests.test_overlay import _poly_df, _square

POLYS = [
    (1, _square(10.0, 10.0, 3.0)),
    (2, _square(20.0, 10.0, 2.0)),
]


def _points(spark):
    rows = []
    for i in range(240):
        lon = 6.0 + (i % 40) * 0.5          # sweeps 6..25.5
        lat = 8.0 + (i % 9) * 0.5           # sweeps 8..12
        score = None if i % 7 == 0 else float(i % 50) / 4.0
        rows.append((i, lat, lon, score))
    return spark.createDataFrame(
        rows, "point_id long, lat double, lon double, score double"
    )


def _canon(rows):
    return sorted(
        (r["poly_id"], r["kind"], r["n_points"], r["score_sum"],
         r["score_min"], r["score_max"], r["score_avg"])
        for r in rows
    )


def test_zonal_stream_matches_batch_and_replays(spark, tmp_path):
    pts = _points(spark)
    polys = _poly_df(spark, POLYS)
    expected = _canon(
        zonal_stats(spark, pts, polys, value_cols=("score",), level=9).collect()
    )
    assert len(expected) == 2 and all(e[2] > 10 for e in expected)

    # three time-ordered micro-batch files
    pdf = pts.toPandas().sort_values("point_id").reset_index(drop=True)
    src = tmp_path / "pts_stream"
    os.makedirs(src)
    k = len(pdf) // 3
    chunks = [pdf.iloc[:k], pdf.iloc[k : 2 * k], pdf.iloc[2 * k :]]
    for i, chunk in enumerate(chunks):
        p = str(src / f"part{i}.parquet")
        spark.createDataFrame(chunk).coalesce(1).write.mode("overwrite").parquet(p)
        t = time.time() + i
        for root, _, files in os.walk(p):
            for fn in files:
                os.utime(os.path.join(root, fn), (t, t))

    state = str(tmp_path / "state")
    index = build_pip_index(spark, polys, level=9)
    fb = zonal_foreach_batch(spark, index, state, value_cols=("score",))
    stream = (
        spark.readStream.schema("point_id long, lat double, lon double, score double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/part*")
    )
    q = (
        stream.writeStream.foreachBatch(fb)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = _canon(zonal_totals(spark, state, value_cols=("score",)).collect())
    assert got == expected

    # replay batch 0 (same batch_id) — dynamic overwrite keeps totals fixed
    fb(spark.createDataFrame(chunks[0]), 0)
    again = _canon(zonal_totals(spark, state, value_cols=("score",)).collect())
    assert again == expected

    unpersist_pip_index(index)
