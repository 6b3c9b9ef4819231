"""G7/G8 — skew handling and checkpoint/lineage resume (north_rule)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wayproblems_spark.plans.checkpoint import (
    CheckpointLog,
    content_fingerprint,
    run_bucketed,
    with_bucket,
)
from wayproblems_spark.plans.skew import (
    adaptive_cell_split,
    cell_histogram,
    grid_expr_from_latlon,
    salted_join,
)

SF = "/root/testdata/sf0.001"


def test_resume_skips_completed_buckets(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    transform = lambda df: df.select("doc_id", F.length("text").alias("n"))

    # one-shot reference run
    ref_log = CheckpointLog(str(tmp_path / "ref_log"))
    done_ref = run_bucketed(docs, "doc_id", 8, transform, ref_log, str(tmp_path / "ref_out"))
    assert done_ref == list(range(8))

    # killed run: stops after 3 buckets
    log = CheckpointLog(str(tmp_path / "log"))
    first = run_bucketed(
        docs, "doc_id", 8, transform, log, str(tmp_path / "out"), fail_after=3
    )
    assert len(first) == 3

    # resume: processes ONLY the remaining buckets
    second = run_bucketed(docs, "doc_id", 8, transform, log, str(tmp_path / "out"))
    assert sorted(first + second) == list(range(8))
    assert not set(first) & set(second)

    # lineage log carries rows + fingerprints; final output identical to
    # the one-shot run, bucket by bucket
    rec, ref_rec = log.completed(), ref_log.completed()
    assert set(rec) == set(ref_rec)
    for b in rec:
        assert rec[b]["rows"] == ref_rec[b]["rows"]
        assert rec[b]["fingerprint"] == ref_rec[b]["fingerprint"]

    out = spark.read.parquet(str(tmp_path / "out/bucket=*"))
    ref = spark.read.parquet(str(tmp_path / "ref_out/bucket=*"))
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, ref.collect()))


def test_bucket_assignment_deterministic(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(100)
    a = sorted(map(tuple, with_bucket(docs, "doc_id", 16).select("doc_id", "bucket").collect()))
    b = sorted(map(tuple, with_bucket(docs.repartition(7), "doc_id", 16).select("doc_id", "bucket").collect()))
    assert a == b


def test_content_fingerprint_order_insensitive(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(100)
    f1 = content_fingerprint(docs.select("doc_id", "text"))
    f2 = content_fingerprint(docs.select("doc_id", "text").orderBy(F.desc("doc_id")).repartition(9))
    f3 = content_fingerprint(docs.select("doc_id", "text").limit(50))
    assert f1 == f2 and f1 != f3


def test_salted_join_matches_plain_join(spark):
    # skewed big side: 80% of rows share one key
    big = spark.range(0, 5000).select(
        F.col("id"),
        F.when(F.col("id") % 5 != 0, F.lit(7)).otherwise(F.col("id") % 40).alias("k"),
    )
    small = spark.range(0, 40).select(F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    plain = sorted(map(tuple, big.join(small, "k").select("id", "v").collect()))
    salted = sorted(
        map(tuple, salted_join(big, small, "k", "id", salts=8).select("id", "v").collect())
    )
    assert plain == salted


def test_adaptive_cell_split(spark):
    # dense cluster at one spot (mega-cell) + sparse background
    import random

    rng = random.Random(3)
    rows = [(i, 51.5 + rng.random() * 2e-2, 8.5 + rng.random() * 2e-2) for i in range(900)]
    rows += [(1000 + i, 51.0 + rng.random(), 8.0 + rng.random()) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    out = adaptive_cell_split(df, "lat", "lon", base_level=8, max_rows_per_cell=200, delta=8)
    hist = cell_histogram(out).collect()
    assert out.count() == 1000
    # the mega-cell must have been split into multiple finer cells
    maxrows = max(r["rows"] for r in hist)
    assert maxrows < 900
    assert len(hist) > 5


def _skewed_points(spark, n=4000):
    # the q24 fixture shape: 3/4 flood a 0.2°×0.2° face-1 window (hot),
    # 1/4 spread over ~50°×70° (cold) — ids drive everything, no RNG
    spread = F.col("id") % 4 == 0
    return spark.range(0, n).select(
        F.col("id"),
        F.when(spread, F.lit(-25.0) + ((F.col("id") * 13) % 50000) / 1000.0)
        .otherwise(F.lit(10.0) + (F.col("id") % 200) / 1000.0)
        .alias("lat"),
        F.when(spread, F.lit(55.0) + ((F.col("id") * 7) % 70000) / 1000.0)
        .otherwise(F.lit(62.0) + ((F.col("id") * 3) % 200) / 1000.0)
        .alias("lon"),
    )


def test_adaptive_split_grid_jvm_matches_udf(spark):
    """encoder="grid_jvm" (pure codegen) must reproduce encoder="grid"
    (numpy pandas-UDF, the q13/q24-oracle-locked packing) exactly — the
    only divergence channel is a ~1e-15/row trig-ulp cell-boundary flip,
    so on a fixed 4k-point fixture equality is deterministic in practice.
    The JVM plan must contain no Python evaluation node at all."""
    pts = _skewed_points(spark)
    kw = dict(base_level=8, max_rows_per_cell=300, delta=2)
    via_udf = adaptive_cell_split(pts, "lat", "lon", encoder="grid", **kw)
    via_jvm = adaptive_cell_split(pts, "lat", "lon", encoder="grid_jvm", **kw)
    a = sorted(map(tuple, via_udf.select("id", "cell").collect()))
    b = sorted(map(tuple, via_jvm.select("id", "cell").collect()))
    assert a == b
    # mixed resolution actually happened: fine cells differ from base set
    levels = {c >> 58 for _, c in a}
    assert levels == {1}  # all face 1
    plan = via_jvm._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    udf_plan = via_udf._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in udf_plan  # the control: udf path does pay it


def test_adaptive_split_mixed_resolution(spark):
    """Hot rows land at base_level+delta, cold rows stay at base_level —
    verified against independently recomputed per-level encodes."""
    pts = _skewed_points(spark)
    out = adaptive_cell_split(
        pts, "lat", "lon", base_level=8, max_rows_per_cell=300, delta=2,
        encoder="grid_jvm",
    )
    chk = pts.select(
        "id",
        grid_expr_from_latlon(F.col("lat"), F.col("lon"), 8).alias("c8"),
        grid_expr_from_latlon(F.col("lat"), F.col("lon"), 10).alias("c10"),
    )
    j = out.join(chk, "id").select("id", "cell", "c8", "c10").collect()
    n_fine = sum(1 for r in j if r["cell"] == r["c10"] and r["cell"] != r["c8"])
    n_base = sum(1 for r in j if r["cell"] == r["c8"])
    assert n_fine + n_base == len(j) == 4000
    assert n_fine >= 2300  # flooded 3/4 (3000 rows) minus worst-case sliver cells
    assert n_base >= 900  # the spread quarter stays coarse
