"""End-to-end CLI smoke: the spark-submit entry point wiring (bucketed run,
written-output-derived tiles, sqlite export, stdout replay, resume guard)."""

from __future__ import annotations

import json
import os
import sqlite3
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_wayproblems_cli(spark, tmp_path):
    from wayproblems_spark.fixtures.pages import generate_corpus, pages_df

    corpus = generate_corpus(n_pages=150, seed=13, split="unit")
    pages_path = str(tmp_path / "pages")
    pages_df(spark, corpus).write.mode("overwrite").parquet(pages_path)
    out = str(tmp_path / "out")

    env = dict(os.environ, SPARK_GRAFT_CPUS="4", SPARK_GRAFT_SHUFFLE="4")
    p = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "run_wayproblems.py"),
            "--pages", pages_path, "--out", out,
            "--buckets", "4", "--tile-z", "11", "--sqlite", "--log-stdout",
        ],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert p.returncode == 0, p.stderr[-2000:]

    # problems written per bucket + lineage log complete
    feats = spark.read.parquet(os.path.join(out, "problems", "bucket=*"))
    n = feats.count()
    assert n > 0
    ckpts = sorted(os.listdir(os.path.join(out, "checkpoints")))
    assert len([c for c in ckpts if c.endswith(".json")]) == 4

    # tiles derived from the written output
    tiles = spark.read.parquet(os.path.join(out, "tiles"))
    assert tiles.count() > 0 and tiles.filter("tile_z != 11").count() == 0

    # meta + sqlite deliverable
    meta = json.load(open(os.path.join(out, "meta.json")))
    assert "layer.wayproblems.popup" in meta
    con = sqlite3.connect(os.path.join(out, "wayproblems.sqlite"))
    total = sum(
        con.execute(f'SELECT COUNT(*) FROM "{t}"').fetchone()[0]
        for t in ("wayproblems", "ref", "footway", "strange", "cycling", "defaults")
    )
    assert total == n
    con.close()

    # stdout replay carries reference-format lines
    assert 'problem="' in p.stdout and "way=" in p.stdout

    # second run without --resume must refuse (checkpoint guard)
    p2 = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "run_wayproblems.py"),
            "--pages", pages_path, "--out", out, "--buckets", "4",
        ],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=120,
    )
    assert p2.returncode != 0 and "resume" in (p2.stderr + p2.stdout)
