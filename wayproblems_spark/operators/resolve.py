"""P3/P4 — node-location resolution + geometry construction.

The reference holds every node location in an in-RAM map and rewrites each
way's refs in a single pass (wayproblems.cpp:28-39, 1576-1585). Distributed
equivalent: ``posexplode`` the ref list, equi-join the node table, re-assemble
vertex order with ``array_sort(collect_list(struct(pos,...)))``.

* Missing node refs are silently dropped (``ignore_errors``,
  wayproblems.cpp:1585) → inner join + per-way reassembly of whatever
  resolved.
* Ways with <2 resolved vertices raise in create_linestring and are skipped
  by the writer's catch (wayproblems.cpp:94, 124-127) → ``drop_invalid``.

Scale notes: the node side is usually far larger than the way-vertex side at
planet scale, but per-key cardinality is tiny and uniform (node ids are
unique) — a plain shuffled equi-join with AQE is the right default physical
plan. When the node table fits in executor memory (regional extracts,
fixtures) pass ``broadcast_nodes=True`` to skip both shuffles.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_locations(
    ways: DataFrame, nodes: DataFrame, broadcast_nodes: bool = False
) -> DataFrame:
    """Attach ``geom: array<struct<lon:double,lat:double>>`` to each way."""
    node_side = F.broadcast(nodes) if broadcast_nodes else nodes
    verts = (
        ways.select("way_id", F.posexplode("nodes").alias("pos", "node_id"))
        .join(node_side, "node_id", "inner")
        .groupBy("way_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "lon", "lat"))).alias("_v"))
    )
    return (
        ways.join(verts, "way_id", "left")
        .withColumn(
            "geom",
            F.coalesce(
                F.transform(
                    "_v",
                    lambda v: F.struct(v["lon"].alias("lon"), v["lat"].alias("lat")),
                ),
                F.array().cast("array<struct<lon:double,lat:double>>"),
            ),
        )
        .drop("_v")
    )


def resolve_locations_mapside(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """Shuffle-free variant: broadcast the whole node index and resolve refs
    inside an Arrow-batched UDF — the literal distributed analog of the
    reference's in-RAM FlexMem index (wayproblems.cpp:28-39).

    Use when (a) the node table fits in executor memory (regional extracts)
    or (b) the way side is a stream (no aggregations allowed in append
    mode). The batch join variant remains the planet-scale default.
    """
    from pyspark.sql.functions import pandas_udf

    spark = ways.sparkSession
    idx = {
        int(r["node_id"]): (float(r["lon"]), float(r["lat"]))
        for r in nodes.select("node_id", "lon", "lat").collect()
    }
    bv = spark.sparkContext.broadcast(idx)

    @pandas_udf("array<struct<lon:double,lat:double>>")
    def _resolve(refs: pd.Series) -> pd.Series:
        m = bv.value
        return refs.map(
            lambda arr: [m[r] for r in arr if r in m] if arr is not None else []
        )

    return ways.withColumn("geom", _resolve(F.col("nodes")))


def drop_invalid_geometry(ways: DataFrame) -> DataFrame:
    """create_linestring-throws semantics: <2 resolved vertices → skip way."""
    return ways.filter(F.size("geom") >= 2)


def wkt_linestring(geom_col) -> "F.Column":
    """WKT rendering of the vertex array (sink-side only; SURVEY.md §1.2)."""
    pts = F.transform(
        geom_col, lambda v: F.concat_ws(" ", v["lon"].cast("string"), v["lat"].cast("string"))
    )
    return F.concat(F.lit("LINESTRING ("), F.concat_ws(",", pts), F.lit(")"))
