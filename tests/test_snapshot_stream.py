"""Streaming ingest into the snapshot table: batch-union parity, replay
idempotence (crash between table commit and checkpoint commit), and
snapshot isolation across commits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wayproblems_spark.sources.snapshot_table import (
    current_version,
    read_manifest,
    read_snapshot,
)
from wayproblems_spark.streaming.snapshot_stream import (
    committed_batch_ids,
    snapshot_ingest_sink,
)


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("page_id"),
        F.concat(F.lit("payload-"), F.col("id")).alias("body"),
    )


@pytest.fixture()
def sunk(spark, tmp_path):
    path = str(tmp_path / "pages_tbl")
    fb = snapshot_ingest_sink(path, stats_cols=("page_id",), n_files=2)
    fb(_batch(spark, 0, 50), 0)
    fb(_batch(spark, 50, 80), 1)
    fb(_batch(spark, 80, 100), 2)
    return path, fb


def test_ingest_union_parity(spark, sunk):
    path, _ = sunk
    got = sorted(r[0] for r in read_snapshot(spark, path).select("page_id").collect())
    assert got == list(range(100))
    assert current_version(path) == 3
    assert committed_batch_ids(path) == {0, 1, 2}


def test_replay_idempotence(spark, sunk):
    path, fb = sunk
    # crash-window replay: the LAST batch is redelivered verbatim
    fb(_batch(spark, 80, 100), 2)
    assert current_version(path) == 3  # no new commit
    got = sorted(r[0] for r in read_snapshot(spark, path).select("page_id").collect())
    assert got == list(range(100))  # no duplicate rows


def test_snapshot_isolation_and_batch_property(spark, sunk):
    path, fb = sunk
    # a reader pinned to v2 does not see batch 2's rows
    assert read_snapshot(spark, path, version=2).count() == 80
    # each manifest carries its batch id (the idempotence record)
    assert read_manifest(path, 3)["properties"]["batch_id"] == 2
    # next live batch lands as v4 and the pinned reader is unaffected
    fb(_batch(spark, 100, 110), 3)
    assert read_snapshot(spark, path, version=2).count() == 80
    assert read_snapshot(spark, path).count() == 110
