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


def drop_invalid_geometry(ways: DataFrame) -> DataFrame:
    """create_linestring-throws semantics: <2 resolved vertices → skip way."""
    return ways.filter(F.size("geom") >= 2)


def wkt_linestring(geom_col) -> "F.Column":
    """WKT rendering of the vertex array (sink-side only; SURVEY.md §1.2)."""
    pts = F.transform(
        geom_col, lambda v: F.concat_ws(" ", v["lon"].cast("string"), v["lat"].cast("string"))
    )
    return F.concat(F.lit("LINESTRING ("), F.concat_ws(",", pts), F.lit(")"))
