"""Deterministic sampling for training-data pipelines.

Random `df.sample()` is non-reproducible across runs/partitionings — a
training corpus needs SAMPLE DECISIONS that are a pure function of the row
key so re-runs, resumes, and incremental appends all agree. The standard
trick: hash the key, keep the row iff the hash lands under the rate.

Hash = first 8 hex chars of md5 (engine-portable — DuckDB replicates it
character-for-character, unlike xxhash64), uniform on [0, 2^32).

* ``hash_sample`` — flat rate over a key column.
* ``stratified_sample`` — per-stratum rates (e.g. downsample by language
  or source quality tier) folded into a codegen CASE threshold; strata
  absent from the map get ``default_rate``.

Scale shape: a codegen filter on a scan — no shuffle, no RNG state, no
driver round-trips; the rate map is a constant in the plan.
Decisions are stable under repartitioning, appends, and resume (pure
function of the key), which `df.sample(seed=)` does NOT give you — its
sampling is per-partition-index and reshuffles change the picked set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = float(2**32)


def _hash_u32(key_col, salt: str) -> Column:
    """Uniform [0, 2^32) from md5(salt || key) — portable across engines."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key_col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def hash_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep each row iff md5-hash(key) / 2^32 < rate. Deterministic,
    repartition-stable, append-consistent."""
    return df.filter(_hash_u32(F.col(key_col), salt) < int(rate * _DENOM))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum keep rates: e.g. ``rates={"en": 0.1, "de": 0.5}`` keeps
    10% of English rows, 50% of German, ``default_rate`` of the rest.
    The hash ignores the stratum, so a row keeps/drops identically if its
    stratum's rate is unchanged while others move."""
    expr = F.lit(int(default_rate * _DENOM))
    for stratum, rate in sorted(rates.items()):
        expr = F.when(
            F.col(stratum_col) == stratum, F.lit(int(rate * _DENOM))
        ).otherwise(expr)
    return df.filter(_hash_u32(F.col(key_col), salt) < expr)


def cap_per_key(
    df: DataFrame,
    key_cols: list[str],
    k: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep at most ``k`` rows per key group (the per-domain / per-source
    cap every web corpus applies so one crawl host can't dominate the
    training mix). WHICH rows survive is deterministic and
    repartition-stable: rows rank by (md5-hash(salt||id), id) within
    their key — i.e. a uniform random-but-frozen draw, with the id as
    total tie-break — so re-runs and engine ports agree exactly.

    Scale shape: one shuffle on the key columns + a per-partition
    row_number (no global sort). A skewed key (one domain = 10% of the
    corpus) makes one partition rank ~corpus/10 rows — ranking is O(n
    log n) per key and streams; if even that is too hot, pre-filter with
    ``hash_sample`` at ~10·k/|key| to shrink the skewed groups first
    (two-pass cap, same final distribution guarantees).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(_hash_u32(F.col(id_col), salt), F.col(id_col))
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
