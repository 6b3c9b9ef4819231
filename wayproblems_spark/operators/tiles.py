"""G6 — web-mercator tiling: per-tile problem counts and raster↔vector.

Tile math is the standard slippy-map formula, computed entirely with
built-in column expressions (floor/ln/tan — whole-stage codegen, no UDF).
Rasterization buckets problems into a PIX×PIX pixel grid inside each tile;
the vector rendering collects deterministic sorted pixel runs per tile.

Determinism: tile/pixel assignment is a pure function of (lon, lat, z);
counts are order-insensitive → bit-stable across cluster sizes.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PIX = 16


def tile_xy(lon: Column, lat: Column, z: int) -> tuple[Column, Column]:
    n = float(1 << z)
    x = F.floor((lon + 180.0) / 360.0 * n)
    lat_rad = F.radians(lat)
    y = F.floor(
        (1.0 - F.log(F.tan(lat_rad) + 1.0 / F.cos(lat_rad)) / math.pi) / 2.0 * n
    )
    # clamp poles
    x = F.greatest(F.lit(0), F.least(x, F.lit(int(n) - 1))).cast("int")
    y = F.greatest(F.lit(0), F.least(y, F.lit(int(n) - 1))).cast("int")
    return x, y


def pixel_xy(lon: Column, lat: Column, z: int) -> tuple[Column, Column]:
    """Pixel index (0..PIX-1) within the tile."""
    n = float(1 << z)
    fx = (lon + 180.0) / 360.0 * n
    lat_rad = F.radians(lat)
    fy = (1.0 - F.log(F.tan(lat_rad) + 1.0 / F.cos(lat_rad)) / math.pi) / 2.0 * n
    px = F.floor((fx - F.floor(fx)) * PIX).cast("int")
    py = F.floor((fy - F.floor(fy)) * PIX).cast("int")
    px = F.greatest(F.lit(0), F.least(px, F.lit(PIX - 1)))
    py = F.greatest(F.lit(0), F.least(py, F.lit(PIX - 1)))
    return px, py


def problem_anchor(problems_df: DataFrame) -> DataFrame:
    """Anchor each problem at its first geometry vertex (deterministic)."""
    return problems_df.withColumn("_a", F.element_at("geom", 1)).select(
        "*", F.col("_a.lon").alias("_lon"), F.col("_a.lat").alias("_lat")
    ).drop("_a")


def tile_counts_anchored(
    df: DataFrame, z: int, lon_col: str = "_lon", lat_col: str = "_lat"
) -> DataFrame:
    """Tile counts over pre-anchored lon/lat columns — used directly on the
    written problems parquet (anchor_lon/anchor_lat) so tiling never needs
    the geometry array or a pipeline recompute."""
    x, y = tile_xy(F.col(lon_col), F.col(lat_col), z)
    return (
        df.withColumn("tile_x", x)
        .withColumn("tile_y", y)
        .groupBy(F.lit(z).alias("tile_z"), "tile_x", "tile_y", "layer")
        .agg(F.count("*").alias("problem_count"))
    )


def tile_counts(problems_df: DataFrame, z: int) -> DataFrame:
    """(tile_z, tile_x, tile_y, layer, problem_count) — shuffle on the tile
    key with map-side partial aggregation (hash agg)."""
    return tile_counts_anchored(problem_anchor(problems_df), z)


def tile_pyramid(problems_df: DataFrame, z_min: int = 6, z_max: int = 15) -> DataFrame:
    """Full tile pyramid: per-tile layer counts at every zoom in
    [z_min, z_max] — the standard production tiling workload.

    Two-shuffle ROLLUP plan: anchor → aggregate once at z_max (the only
    problem-sized shuffle) → explode the zoom range over the per-tile rows
    and derive each parent id by bit shift → sum with map-side partials.
    Exactness: doubles scale by powers of two losslessly, so
    ``floor(base·2^z) == floor(base·2^z_max) >> (z_max−z)`` (clamps
    included) — the rollup is BIT-IDENTICAL to the direct per-zoom floor
    (``tile_pyramid_direct``, test-asserted) while shuffling
    ~#tiles(z_max) rows instead of #problems × #zooms."""
    return tile_pyramid_anchored(problem_anchor(problems_df), z_min, z_max)


def tile_pyramid_anchored(
    df: DataFrame, z_min: int = 6, z_max: int = 15,
    lon_col: str = "_lon", lat_col: str = "_lat", layer_col: str = "layer",
) -> DataFrame:
    """tile_pyramid over pre-anchored lon/lat COLUMNS (the written
    problems parquet carries anchor_lon/anchor_lat — same reason
    tile_counts_anchored exists). Skipping the per-row array<struct>
    geometry round-trip matters at scale: wrapping points into arrays
    just to take element 1 doubles per-row allocations and makes the scan
    DRAM-allocation-bound instead of compute-bound (measured on the bench
    tile leg: the anchored form both runs faster and scales further)."""
    n = float(1 << z_max)
    fx = (F.col(lon_col) + 180.0) / 360.0 * n
    lat_rad = F.radians(lat_col)
    fy = (1.0 - F.log(F.tan(lat_rad) + 1.0 / F.cos(lat_rad)) / math.pi) / 2.0 * n
    x = F.greatest(F.lit(0.0), F.least(F.floor(fx), F.lit(n - 1))).cast("int")
    y = F.greatest(F.lit(0.0), F.least(F.floor(fy), F.lit(n - 1))).cast("int")
    base = (
        df.select(F.col(layer_col).alias("layer"), x.alias("x"), y.alias("y"))
        .groupBy("x", "y", "layer")
        .agg(F.count("*").alias("c"))
    )
    zooms = F.explode(
        F.sequence(F.lit(z_min), F.lit(z_max)).cast("array<int>")
    ).alias("tile_z")
    return (
        base.select("x", "y", "layer", "c", zooms)
        .select(
            "tile_z",
            F.expr(f"shiftright(x, {z_max} - tile_z)").alias("tile_x"),
            F.expr(f"shiftright(y, {z_max} - tile_z)").alias("tile_y"),
            "layer", "c",
        )
        .groupBy("tile_z", "tile_x", "tile_y", "layer")
        .agg(F.sum("c").alias("problem_count"))
    )


def tile_pyramid_direct(problems_df: DataFrame, z_min: int = 6, z_max: int = 15) -> DataFrame:
    """Direct per-zoom formulation (explode problems × zooms, one shuffle
    on (z, x, y, layer)) — kept as the independent oracle for the rollup
    equivalence test."""
    df = problem_anchor(problems_df)
    zooms = F.explode(
        F.sequence(F.lit(z_min), F.lit(z_max)).cast("array<int>")
    ).alias("tile_z")
    df = df.select("layer", "_lon", "_lat", zooms)
    n = F.pow(F.lit(2.0), F.col("tile_z"))
    fx = (F.col("_lon") + 180.0) / 360.0 * n
    lat_rad = F.radians("_lat")
    fy = (1.0 - F.log(F.tan(lat_rad) + 1.0 / F.cos(lat_rad)) / math.pi) / 2.0 * n
    x = F.greatest(F.lit(0.0), F.least(F.floor(fx), n - 1)).cast("int")
    y = F.greatest(F.lit(0.0), F.least(F.floor(fy), n - 1)).cast("int")
    return (
        df.withColumn("tile_x", x)
        .withColumn("tile_y", y)
        .groupBy("tile_z", "tile_x", "tile_y", "layer")
        .agg(F.count("*").alias("problem_count"))
    )


def rasterize(problems_df: DataFrame, z: int) -> DataFrame:
    """vector→raster: per-tile PIX×PIX pixel counts."""
    df = problem_anchor(problems_df)
    x, y = tile_xy(F.col("_lon"), F.col("_lat"), z)
    px, py = pixel_xy(F.col("_lon"), F.col("_lat"), z)
    return (
        df.withColumn("tile_x", x)
        .withColumn("tile_y", y)
        .withColumn("px", px)
        .withColumn("py", py)
        .groupBy(F.lit(z).alias("tile_z"), "tile_x", "tile_y", "px", "py")
        .agg(F.count("*").alias("n"))
    )


def raster_to_vector(raster_df: DataFrame) -> DataFrame:
    """raster→vector: per tile, a deterministic sorted run-list of lit
    pixels (py*PIX+px encoded) — the inverse direction of `rasterize`."""
    return (
        raster_df.withColumn("pidx", F.col("py") * PIX + F.col("px"))
        .groupBy("tile_z", "tile_x", "tile_y")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pidx", "n"))
            ).alias("pixels"),
            F.sum("n").alias("total"),
        )
    )
