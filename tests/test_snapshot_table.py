"""Iceberg-style snapshot table: snapshots/time-travel, manifest pruning
(plan-level file skipping asserted on inputFiles), optimistic-concurrency
conflicts, compaction, and snapshot expiry."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wayproblems_spark.sources.snapshot_table import (
    CommitConflict,
    append_snapshot,
    compact_snapshot,
    create_snapshot_table,
    current_version,
    expire_snapshots,
    read_manifest,
    read_snapshot,
    snapshot_history,
)


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("bucket"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    create_snapshot_table(
        spark, path, _docs(spark, 0, 100), stats_cols=("doc_id",), n_files=4
    )
    return path


def test_create_read_roundtrip(spark, table):
    df = read_snapshot(spark, table)
    assert df.count() == 100
    assert current_version(table) == 1
    m = read_manifest(table)
    assert len(m["files"]) == 4
    assert sum(f["rows"] for f in m["files"]) == 100
    # per-file stats cover the full range with no overlap gaps
    los = sorted(f["stats"]["doc_id"][0] for f in m["files"])
    assert los[0] == 0 and max(f["stats"]["doc_id"][1] for f in m["files"]) == 99


def test_append_and_time_travel(spark, table):
    append_snapshot(spark, table, _docs(spark, 100, 150), n_files=2)
    assert current_version(table) == 2
    assert read_snapshot(spark, table).count() == 150
    # time travel: v1 still reads the original 100 rows
    assert read_snapshot(spark, table, version=1).count() == 100
    hist = snapshot_history(table)
    assert [h["version"] for h in hist] == [1, 2]
    assert hist[1]["n_rows"] == 150 and hist[1]["n_files"] == 6


def test_manifest_pruning_skips_files(spark, table):
    append_snapshot(spark, table, _docs(spark, 1000, 1100), n_files=4)
    full = read_snapshot(spark, table)
    pruned = read_snapshot(spark, table, prune={"doc_id": (1000, 1050)})
    # correctness: pruning never changes which rows match a real filter
    want = sorted(
        r[0] for r in full.filter("doc_id between 1000 and 1050").select("doc_id").collect()
    )
    got = sorted(
        r[0]
        for r in pruned.filter("doc_id between 1000 and 1050").select("doc_id").collect()
    )
    assert got == want and len(got) == 51
    # plan-level: the pruned scan opens strictly fewer data files
    assert 0 < len(pruned.inputFiles()) < len(full.inputFiles())
    # every surviving file can actually intersect the range
    m = read_manifest(table)
    surv = {os.path.basename(p) for p in pruned.inputFiles()}
    for f in m["files"]:
        if os.path.basename(f["path"]) in surv:
            lo, hi = f["stats"]["doc_id"]
            assert lo <= 1050 and hi >= 1000


def test_prune_requires_recorded_stats(spark, table):
    with pytest.raises(ValueError, match="no recorded stats"):
        read_snapshot(spark, table, prune={"bucket": (0, 1)})


def test_commit_conflict(spark, table):
    # simulate a racing writer: advance the pointer under append's feet
    from wayproblems_spark.sources import snapshot_table as st

    parent = read_manifest(table)
    m = dict(parent, version=2, parent=1, operation="append")
    st._commit(table, m, 1)  # racer wins
    with pytest.raises(CommitConflict):
        st._commit(table, dict(m, version=2), 1)  # stale writer loses
    assert current_version(table) == 2


def test_compact_and_expire(spark, table):
    for lo in (100, 200, 300):
        append_snapshot(spark, table, _docs(spark, lo, lo + 50), n_files=2)
    v = compact_snapshot(spark, table, target_files=3)
    assert v == 5
    assert read_snapshot(spark, table).count() == 250
    assert len(read_manifest(table)["files"]) == 3
    # old snapshot still readable pre-expiry
    assert read_snapshot(spark, table, version=2).count() == 150
    out = expire_snapshots(table, keep_last=1)
    assert out["manifests_removed"] == 4 and out["files_removed"] > 0
    # current still intact; expired version gone
    assert read_snapshot(spark, table).count() == 250
    with pytest.raises(FileNotFoundError):
        read_manifest(table, 2)
