"""G7 — explicit skew handling for custom keys (mega-cells).

AQE's skew-join splitting handles shuffle-size skew automatically (enabled
in session.py), but skew in *our* keys — dense urban cells where one H3/S2
bucket holds orders of magnitude more rows — is better treated at the source:

* ``salted_repartition`` — spread one hot key over `salts` partitions while
  keeping a deterministic assignment (salt derives from a row-unique column,
  not from randomness → reproducible, bit-stable).
* ``salted_join`` — the classic replicate-small-side salted equi-join.
* ``adaptive_cell_split`` — promote cells whose row count exceeds a budget
  to their children at `level+delta` (finer cells), leaving cold cells
  coarse: the "adaptive cell splitting" of BASELINE.json north_star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.cells import MAX_LEVEL, cell_udf


def salted_repartition(
    df: DataFrame, key_col: str, unique_col: str, salts: int, num_partitions: int | None = None
) -> DataFrame:
    salt = F.pmod(F.xxhash64(F.col(unique_col)), F.lit(salts))
    salted = F.concat_ws("_", F.col(key_col).cast("string"), salt.cast("string"))
    if num_partitions:
        return df.repartition(num_partitions, salted)
    return df.repartition(salted)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    big_unique_col: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on `on` with the big side salted and the small side
    replicated `salts`× — hot keys spread over `salts` reducers."""
    b = big.withColumn("_salt", F.pmod(F.xxhash64(F.col(big_unique_col)), F.lit(salts)).cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)).cast("array<int>"))
    )
    return b.join(s, [on, "_salt"], how).drop("_salt")


def cell_histogram(df: DataFrame, cell_col: str = "cell") -> DataFrame:
    return df.groupBy(cell_col).agg(F.count("*").alias("rows"))


def adaptive_cell_split(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    base_level: int,
    max_rows_per_cell: int,
    delta: int = 2,
    cell_col: str = "cell",
) -> DataFrame:
    """Two-pass adaptive split: count per base cell; rows in hot cells get a
    finer (level+delta) cell id, cold rows keep the base cell. The output
    `cell` column is the partition-friendly mixed-resolution key."""
    base = df.withColumn(cell_col, cell_udf(base_level)(F.col(lat_col), F.col(lon_col)))
    hot = (
        base.groupBy(cell_col)
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > max_rows_per_cell)
        .select(cell_col)
        .withColumn("_hot", F.lit(True))
    )
    fine_level = min(base_level + delta, MAX_LEVEL)
    out = base.join(F.broadcast(hot), cell_col, "left")
    return out.withColumn(
        cell_col,
        F.when(
            F.col("_hot").isNotNull(),
            cell_udf(fine_level)(F.col(lat_col), F.col(lon_col)),
        ).otherwise(F.col(cell_col)),
    ).drop("_hot")
