"""P9 — the `accesscombinations` utility (the reference's second binary,
accesscombinations.cpp:26-53): for every way with a highway tag, print the
present access-ish tags as "key=value " pairs, optionally prefixed by the
way id. Pure scan + filter + projection — one narrow JVM stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# accesscombinations.cpp:38-41 — fixed key order
DUMP_TAGS = (
    "highway", "access", "vehicle", "motor_vehicle", "motorcycle",
    "motorcar", "hgv", "psv", "bicycle", "foot", "agricultural",
    "goods", "mofa", "moped", "horse",
)


def access_combinations(ways: DataFrame, with_wayid: bool = False) -> DataFrame:
    """One output line per way with a highway tag (trailing space kept,
    matching the C++ `<< key << "=" << value << " "` loop)."""
    df = ways.filter(F.map_contains_key("tags", "highway"))
    parts = [
        F.when(
            F.map_contains_key("tags", k),
            F.concat(F.lit(k + "="), F.col("tags").getItem(k), F.lit(" ")),
        ).otherwise(F.lit(""))
        for k in DUMP_TAGS
    ]
    line = F.concat(*parts)
    if with_wayid:
        line = F.concat(F.col("way_id").cast("string"), F.lit(" "), line)
    return df.select(F.col("way_id"), line.alias("line"))


def combination_histogram(ways: DataFrame) -> DataFrame:
    """Aggregated variant the C++ pipeline does with sort|uniq -c:
    distinct access combinations with counts, most frequent first."""
    return (
        access_combinations(ways)
        .groupBy("line")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("line"))
    )
