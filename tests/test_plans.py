"""Physical-plan audits: assert the optimizations we designed for actually
appear in the executed plans (SURVEY.md §4).

These guard against regressions like a filter silently stopping to push
down, a broadcast turning into a shuffle, or Python sneaking into the rule
path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wayproblems_spark.fixtures.pages import generate_corpus, pages_df
from wayproblems_spark.operators.pip import point_in_polygon
from wayproblems_spark.rules import problems
from wayproblems_spark.sources.pages_source import nodes_from_pages, polys_from_pages


def plan_str(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    em = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(em)


def test_gate_filter_pushed_to_parquet_scan(spark, tmp_path):
    corpus = generate_corpus(n_pages=60, seed=3, split="unit")
    from wayproblems_spark.sources.pages_source import ways_from_pages

    ways = ways_from_pages(pages_df(spark, corpus)).drop("src_url")
    path = str(tmp_path / "ways")
    ways.write.parquet(path)

    probs = problems(spark.read.parquet(path))
    plan = plan_str(probs)
    # the highway gate must sit directly on the scan (pushed below the
    # projection); MapType members can't reach PushedFilters, but the
    # filter must not be separated from the scan by an Exchange
    assert "Exchange" not in plan.split("Filter")[0], plan
    # single narrow stage: no shuffle anywhere in the rule plan
    assert "Exchange" not in plan


def test_rule_plan_is_jvm_only(spark, tmp_path):
    corpus = generate_corpus(n_pages=60, seed=3, split="unit")
    from wayproblems_spark.sources.pages_source import ways_from_pages

    ways = ways_from_pages(pages_df(spark, corpus)).drop("src_url")
    probs = problems(ways)
    plan = plan_str(probs)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert marker not in plan, f"python stage {marker} in rule path"
    # '*(n)' operator prefix in simple mode == inside WholeStageCodegen
    assert "*(" in plan_str(probs, "simple")


def test_column_pruning_reaches_scan(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = docs.select("doc_id").filter(F.col("doc_id") > 10)
    plan = plan_str(q)
    assert "ReadSchema: struct<doc_id:bigint>" in plan
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,10)]" in plan


def test_pip_uses_broadcast_join(spark):
    corpus = generate_corpus(n_pages=60, seed=3, split="unit")
    pdf = pages_df(spark, corpus)
    pts = nodes_from_pages(pdf).select(F.col("node_id").alias("point_id"), "lat", "lon")
    res = point_in_polygon(spark, pts, polys_from_pages(pdf), level=10)
    plan = plan_str(res, "simple")
    assert "BroadcastHashJoin" in plan
    # the big (point) side must not shuffle for the join
    assert "SortMergeJoin" not in plan
    # the ray cast must be a codegen hash aggregate, not an interpreted
    # higher-order fold over the ring array (VERDICT r3 "wrong #1")
    assert "aggregate(" not in plan
    assert plan.count("HashAggregate") >= 2  # map-side partial + final


def test_tile_counts_partial_aggregation(spark):
    from wayproblems_spark.operators.resolve import (
        drop_invalid_geometry,
        resolve_locations,
    )
    from wayproblems_spark.operators.tiles import tile_counts
    from wayproblems_spark.sources.pages_source import ways_from_pages

    corpus = generate_corpus(n_pages=60, seed=3, split="unit")
    pdf = pages_df(spark, corpus)
    resolved = drop_invalid_geometry(
        resolve_locations(ways_from_pages(pdf).drop("src_url"), nodes_from_pages(pdf), True)
    )
    plan = plan_str(tile_counts(problems(resolved), 12), "simple")
    # map-side partial agg before the exchange, final after
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan or "Partial" in plan


def test_pages_table_partition_pruning(spark, tmp_path):
    """Date-partitioned pages layout: a date-range read must prune at the
    PartitionFilters level (directory skip), not post-scan."""
    from wayproblems_spark.sources.pages_source import (
        read_pages_table,
        write_pages_table,
    )

    corpus = generate_corpus(n_pages=120, seed=9, split="unit")
    pages = pages_df(spark, corpus)
    # spread warc_ts over 4 days deterministically
    pages = pages.withColumn(
        "warc_ts",
        F.timestamp_seconds(
            F.unix_timestamp("warc_ts")
            + (F.xxhash64("url") % 4) * F.lit(86400)
        ),
    )
    path = str(tmp_path / "pages_table")
    write_pages_table(pages, path)

    import datetime

    all_dates = sorted(
        r["warc_date"]
        for r in read_pages_table(path, spark).select("warc_date").distinct().collect()
    )
    assert len(all_dates) >= 3
    pick = all_dates[1]
    df = read_pages_table(path, spark, since=pick, until=pick + datetime.timedelta(days=1))
    plan = plan_str(df)
    assert "PartitionFilters" in plan and "warc_date" in plan.split("PartitionFilters")[1][:200]
    got_dates = {r["warc_date"] for r in df.select("warc_date").distinct().collect()}
    assert got_dates == {pick}
