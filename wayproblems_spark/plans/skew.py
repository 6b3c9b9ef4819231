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

from ..operators.cells import MAX_LEVEL, cell_udf, grid_expr_from_xyz, grid_udf


def grid_expr_from_latlon(lat_col, lon_col, level: int):
    """Packed face/i/j grid id at `level` as a PURE JVM Column expression
    over lat/lon degree columns — `grid_expr_from_xyz` fed by JVM trig.

    JVM Math.cos/sin may differ from numpy/libm by ~1 ulp, which can move a
    point sitting within ~1 ulp of a cell boundary into the adjacent cell
    (odds ~1e-15/row) — the same documented slack argument as
    `grid_expr_from_xyz`. The canonical cross-engine encoder (the one the
    q13/q24 DuckDB oracles lock) remains `latlon_to_grid`/`grid_udf`; this
    expression is for hot paths where the Arrow round trip dominates."""
    rad_lat, rad_lon = F.radians(lat_col), F.radians(lon_col)
    x = F.cos(rad_lat) * F.cos(rad_lon)
    y = F.cos(rad_lat) * F.sin(rad_lon)
    z = F.sin(rad_lat)
    return grid_expr_from_xyz(x, y, z, level)


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
    encoder: str = "s2",
) -> DataFrame:
    """Two-pass adaptive split: count per base cell; rows in hot cells get a
    finer (level+delta) cell id, cold rows keep the base cell. The output
    `cell` column is the partition-friendly mixed-resolution key.

    ``encoder`` picks the cell id family (both share the exact same
    face/ST/(i,j) geometry, so the hot/cold partitioning is identical):

    * ``"s2"`` (default) — full Hilbert S2 id via the numpy pandas-UDF
      (`cells.cell_udf`): use when downstream wants range locality.
    * ``"grid"`` — packed face/i/j grid id via the numpy pandas-UDF
      (`cells.grid_udf`): the canonical cross-engine encoding the q13/q24
      DuckDB oracles replicate closed-form.
    * ``"grid_jvm"`` — same packed grid id as a pure Column expression
      (`grid_expr_from_latlon`): the whole operator becomes UDF-free
      whole-stage codegen (count, hot-set broadcast, re-encode), the right
      choice on a 100 TB hot path. Bit-equal to ``"grid"`` except for rows
      within ~1 ulp of a cell boundary (odds ~1e-15/row, see
      `grid_expr_from_latlon`)."""
    if encoder == "s2":
        enc = lambda lvl: cell_udf(lvl)(F.col(lat_col), F.col(lon_col))  # noqa: E731
    elif encoder == "grid":
        enc = lambda lvl: grid_udf(lvl)(F.col(lat_col), F.col(lon_col))  # noqa: E731
    elif encoder == "grid_jvm":
        enc = lambda lvl: grid_expr_from_latlon(  # noqa: E731
            F.col(lat_col), F.col(lon_col), lvl
        )
    else:
        raise ValueError(f"unknown encoder {encoder!r} (s2 | grid | grid_jvm)")
    base = df.withColumn(cell_col, enc(base_level))
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
        F.when(F.col("_hot").isNotNull(), enc(fine_level)).otherwise(F.col(cell_col)),
    ).drop("_hot")
