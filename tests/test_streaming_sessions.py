"""Stateful streaming sessionization (applyInPandasWithState) vs the batch
q10 oracle: same gap semantics, same per-user session ordinals."""

from __future__ import annotations

import os
import time

import pandas as pd
from pyspark.sql import functions as F

from wayproblems_spark.streaming.sessions import sessionize_stream

SF = "/root/testdata/sf0.001"
GAP = 1800


def _expected_sessions(pdf: pd.DataFrame) -> set[tuple]:
    out = []
    for uid, g in pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        sid, n, last = 0, 0, None
        for ts in g["ts"].astype("int64") // 10**9:
            if last is None or ts - last > GAP:
                if n:
                    out.append((uid, sid, n))
                sid += 1
                n = 1
            else:
                n += 1
            last = int(ts)
        if n:
            out.append((uid, sid, n))
    return set(out)


def test_streaming_sessions_match_batch(spark, tmp_path):
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("user_id") < 30)
        .select("event_id", "ts", "user_id")
    )
    pdf = ev.toPandas()
    assert len(pdf) > 50
    expected = _expected_sessions(pdf)

    # time-ordered micro-batch files + a far-future flush event that pushes
    # the watermark past every real session's close
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    src = tmp_path / "stream_src"
    os.makedirs(src)
    thirds = [pdf.iloc[: len(pdf) // 3], pdf.iloc[len(pdf) // 3 : 2 * len(pdf) // 3],
              pdf.iloc[2 * len(pdf) // 3 :]]
    flush = pd.DataFrame(
        {
            "event_id": [999999999],
            "ts": [pdf["ts"].max() + pd.Timedelta(days=30)],
            "user_id": [999999],
        }
    )
    for i, chunk in enumerate(thirds + [flush]):
        p = str(src / f"part{i}.parquet")
        spark.createDataFrame(chunk).coalesce(1).write.mode("overwrite").parquet(p)
        t = time.time() + i  # strictly increasing mtimes → discovery order
        for root, _, files in os.walk(p):
            for fn in files:
                os.utime(os.path.join(root, fn), (t, t))

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src) + "/part*")
    )
    q = (
        sessionize_stream(stream, gap_s=GAP, watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["user_id"], r["session_id"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
        if r["user_id"] != 999999
    }
    assert got == expected


def test_session_ordinal_survives_timeout(spark, tmp_path):
    """A user who goes idle (session closed by event-time timeout) and
    returns must continue at the NEXT session ordinal — matching the batch
    formulation — not restart at 1 (round-2 ADVICE: state.remove() lost
    the ordinal)."""
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    g = pd.Timedelta(seconds=GAP)

    def df(rows):
        return pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])

    batches = [
        df([(1, t0, 1), (2, t0 + pd.Timedelta(seconds=60), 1)]),
        # other user pushes watermark past user 1's session close
        df([(3, t0 + 3 * g, 2)]),
        # user 1 returns after the idle period
        df([(4, t0 + 4 * g, 1)]),
        # far-future flush closes everything still open
        df([(5, t0 + pd.Timedelta(days=30), 999999)]),
    ]
    src = tmp_path / "stream_src2"
    os.makedirs(src)
    for i, chunk in enumerate(batches):
        p = str(src / f"part{i}.parquet")
        spark.createDataFrame(chunk).coalesce(1).write.mode("overwrite").parquet(p)
        t = time.time() + i
        for root, _, files in os.walk(p):
            for fn in files:
                os.utime(os.path.join(root, fn), (t, t))

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src) + "/part*")
    )
    q = (
        sessionize_stream(stream, gap_s=GAP, watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sess_out2")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["user_id"], r["session_id"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess_out2").collect()
        if r["user_id"] == 1
    }
    assert got == {(1, 1, 2), (1, 2, 1)}
