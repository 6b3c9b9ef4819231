"""P7/P8 — layer-partitioned problems sink + stdout-format log sink.

The reference appends each problem to one of 6 SpatiaLite LineString layers
with a fixed 9-field all-string schema (wayproblems.cpp:75-90) and prints one
stdout line per problem (cpp:114-120). Here: ONE problems DataFrame written
``partitionBy("layer")`` — partition pruning then gives per-layer reads for
free — plus a text rendering with the identical line format.

Quirk Q6: the reference declares `key`/`value` columns but never fills them;
we carry them as always-null for schema parity.
Quirk Q7: ids/changesets/versions are stringified through doubles by OGR; we
render decimal strings directly (identical for ids < 2^53).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.resolve import wkt_linestring

LAYER_FIELD_ORDER = (
    "id", "key", "value", "changeset", "user", "timestamp",
    "problem", "version", "style",
)


def layer_features(problems_df: DataFrame, with_anchor: bool = False) -> DataFrame:
    """Render the 9-field feature schema + geometry WKT + layer column.

    ``with_anchor=True`` additionally carries the first-vertex lon/lat
    (``anchor_lon``/``anchor_lat``) so downstream tiling can run off the
    written parquet without re-deriving geometry — the bucketed production
    job uses this to compute tiles from what it already wrote instead of a
    second full pipeline pass.
    """
    has_geom = "geom" in problems_df.columns
    geometry = (
        wkt_linestring(F.col("geom")) if has_geom else F.lit(None).cast("string")
    )
    anchor_cols = []
    if with_anchor:
        first = F.element_at("geom", 1) if has_geom else None
        anchor_cols = [
            (first["lon"] if has_geom else F.lit(None).cast("double")).alias("anchor_lon"),
            (first["lat"] if has_geom else F.lit(None).cast("double")).alias("anchor_lat"),
        ]
    return problems_df.select(
        F.col("way_id").cast("string").alias("id"),
        F.lit(None).cast("string").alias("key"),
        F.lit(None).cast("string").alias("value"),
        F.col("changeset").cast("string").alias("changeset"),
        F.col("user"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("timestamp"),
        F.col("problem"),
        F.col("version").cast("string").alias("version"),
        F.col("style"),
        geometry.alias("geometry"),
        F.col("layer"),
        F.col("site"),
        F.col("sub"),
        *anchor_cols,
    )


def stdout_from_features(features_df: DataFrame) -> DataFrame:
    """Reference-format stdout line (wayproblems.cpp:114-120) rendered from
    the WRITTEN 9-field feature schema — lets the production job replay the
    log from its own problems parquet instead of recomputing the pipeline.
    Byte-identical to ``rules.stdout_log`` (same double space after '||';
    the feature ``timestamp`` column already carries the formatted value)."""
    return features_df.select(
        F.format_string(
            'way=%s problem="%s" ||  changeset=%s user="%s" timestamp=%s layer=%s version=%s',
            F.col("id"),
            F.col("problem"),
            F.col("changeset"),
            F.col("user"),
            F.col("timestamp"),
            F.col("layer"),
            F.col("version"),
        ).alias("line"),
        F.col("id").cast("long").alias("way_id"),
        F.col("site"),
        F.col("sub"),
    )


def write_problems(problems_df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Layer-partitioned sink. At cluster scale the layer column is the
    partition key (6 values → coarse); within a layer files split naturally
    by task. Sorting within partitions keeps the reference's per-way
    emission order reproducible on read."""
    (
        layer_features(problems_df)
        .repartition("layer")
        .sortWithinPartitions("id", "site", "sub")
        .write.mode("overwrite")
        .partitionBy("layer")
        .format(fmt)
        .save(path)
    )
