"""Bucketed production job parity: global node resolution + bucket-by-way_id
must reproduce the one-shot pipeline exactly, even though the fixture corpus
scatters a way's node refs across pages in OTHER buckets
(fixtures/pages.py scatter). Also covers the written-parquet-derived tiles
and stdout replay (no pipeline recompute) and the staged-input layout."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from wayproblems_spark.operators.resolve import (
    drop_invalid_geometry,
    resolve_locations,
)
from wayproblems_spark.operators.tiles import tile_counts, tile_counts_anchored
from wayproblems_spark.pipeline import corpus_frames
from wayproblems_spark.plans.checkpoint import CheckpointLog, run_bucketed
from wayproblems_spark.rules import problems, stdout_log
from wayproblems_spark.sinks.writer import layer_features, stdout_from_features


def _resolved(spark, n_pages=300, seed=7):
    pages, ways, nodes, _ = corpus_frames(spark, n_pages, seed, "unit")
    return pages, drop_invalid_geometry(
        resolve_locations(ways, nodes, broadcast_nodes=False)
    )


def test_bucketed_matches_oneshot_with_scattered_nodes(spark, tmp_path):
    pages, resolved = _resolved(spark)

    one_shot = layer_features(problems(resolved), with_anchor=True)
    expected = sorted(map(tuple, one_shot.collect()))
    assert expected, "fixture corpus must flag problems"

    log = CheckpointLog(str(tmp_path / "log"))
    transform = lambda df: layer_features(problems(df), with_anchor=True)
    done = run_bucketed(
        resolved, "way_id", 8, transform, log, str(tmp_path / "problems")
    )
    assert done == list(range(8))

    written = spark.read.parquet(str(tmp_path / "problems" / "bucket=*"))
    assert sorted(written.columns) == sorted(one_shot.columns)
    got = sorted(map(tuple, written.select(*one_shot.columns).collect()))
    assert got == expected

    # staged input written exactly once, partitioned by bucket
    staged = str(tmp_path / "problems.staged")
    assert os.path.exists(os.path.join(staged, "_SUCCESS"))
    assert any(n.startswith("bucket=") for n in os.listdir(staged))


def test_tiles_and_stdout_replay_from_written_features(spark, tmp_path):
    pages, resolved = _resolved(spark, n_pages=200, seed=11)
    probs = problems(resolved)

    log = CheckpointLog(str(tmp_path / "log"))
    transform = lambda df: layer_features(problems(df), with_anchor=True)
    run_bucketed(resolved, "way_id", 4, transform, log, str(tmp_path / "problems"))
    feats = spark.read.parquet(str(tmp_path / "problems" / "bucket=*"))

    # tiles from the written parquet == tiles from the live pipeline
    z = 12
    a = sorted(map(tuple, tile_counts_anchored(feats, z, "anchor_lon", "anchor_lat").collect()))
    b = sorted(map(tuple, tile_counts(probs, z).collect()))
    assert a == b

    # stdout replay byte-identical to the live log
    replay = sorted(r["line"] for r in stdout_from_features(feats).collect())
    live = sorted(r["line"] for r in stdout_log(probs).collect())
    assert replay == live


def test_resume_after_kill_still_matches(spark, tmp_path):
    _, resolved = _resolved(spark, n_pages=150, seed=3)
    transform = lambda df: layer_features(problems(df), with_anchor=True)

    ref_log = CheckpointLog(str(tmp_path / "ref_log"))
    run_bucketed(resolved, "way_id", 6, transform, ref_log, str(tmp_path / "ref"))

    log = CheckpointLog(str(tmp_path / "log"))
    first = run_bucketed(
        resolved, "way_id", 6, transform, log, str(tmp_path / "out"), fail_after=2
    )
    assert len(first) == 2
    second = run_bucketed(
        resolved, "way_id", 6, transform, log, str(tmp_path / "out")
    )
    assert sorted(first + second) == list(range(6))

    ref = spark.read.parquet(str(tmp_path / "ref" / "bucket=*"))
    out = spark.read.parquet(str(tmp_path / "out" / "bucket=*"))
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, ref.collect()))
    rec, ref_rec = log.completed(), ref_log.completed()
    for b in ref_rec:
        assert rec[b]["rows"] == ref_rec[b]["rows"]
        assert rec[b]["fingerprint"] == ref_rec[b]["fingerprint"]
