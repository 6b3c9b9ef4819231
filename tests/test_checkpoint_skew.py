"""G7/G8 — skew handling and checkpoint/lineage resume (north_rule)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wayproblems_spark.plans.checkpoint import (
    CheckpointLog,
    content_fingerprint,
    run_bucketed,
    with_bucket,
)
from wayproblems_spark.plans.skew import adaptive_cell_split, cell_histogram, salted_join

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
