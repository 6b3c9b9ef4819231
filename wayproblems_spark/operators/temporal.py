"""Temporal joins the built-in DataFrame API lacks: as-of and interval.

The reference engine has exactly one join (the node-location resolution,
wayproblems.cpp way() — an equi index-lookup); these are graft additions for
the training-data-pipeline mandate (event attribution, session enrichment,
slowly-changing-dimension lookups).

* ``asof_join`` — for every left row, the single right row with the latest
  ``right_ts`` ≤ ``left_ts`` (direction="backward", inclusive; "forward"
  mirrors it). The classic implementation is a sort-merge with a
  last-value carry; Spark has no ASOF keyword, but the same physical shape
  falls out of UNION → single shuffle on the key → in-partition sort →
  running ``last(ignorenulls)`` window. That is ONE shuffle of each side
  and no join blow-up at any key multiplicity — strictly better than the
  naive equi-join + filter + argmax, which materializes |L_k|·|R_k| rows
  per key before pruning.

* ``interval_join`` — left rows matched to right intervals containing
  their timestamp. Scale shape: right intervals explode into the
  fixed-width time buckets they overlap; left rows key by their single
  bucket; the join is a plain equi-join on (key, bucket) followed by the
  exact BETWEEN filter. Each (left, right) match is found exactly once —
  the left row's bucket is unique — so no post-dedup shuffle. Bucket
  width trades replication (long intervals → many buckets) against
  candidate-set size; at 100 TB pick it near the median interval length.

Determinism: ``asof_join`` ties at equal ``right_ts`` within a key are
broken by ``tie_col`` descending (default: the right timestamp column
itself, i.e. duplicate-ts rows are ambiguous unless a tie_col is given —
same contract pandas.merge_asof documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_list(x) -> list[str]:
    if x is None:
        return []
    return [x] if isinstance(x, str) else list(x)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str] | None,
    left_ts: str = "ts",
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance_s: float | None = None,
    right_cols: list[str] | None = None,
    tie_col: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """As-of join: each left row gains the columns of its matching right
    row (NULLs when none exists — LEFT semantics, like DuckDB's
    ``ASOF LEFT JOIN`` and pandas ``merge_asof``).

    direction="backward": latest right with right_ts <= left_ts.
    direction="forward":  earliest right with right_ts >= left_ts.
    tolerance_s: matches farther than this many seconds are nulled out.

    Right columns keep their names unless they collide with a left column,
    in which case they get ``suffix``. The match timestamp is always
    exposed as ``matched_ts``.

    Plan shape: union(tagged L, tagged R) → one hash shuffle on `on` →
    in-partition sort by (ts, side, tie) → running last/first(ignorenulls)
    → filter back to left rows. One window pass, no per-key blow-up.
    A single pathological key serializes into one partition (windows
    cannot be salted without breaking the carry order) — for that shape
    use ``interval_join`` with an explicit tolerance instead.
    Keyless (`on=None`) as-of is a total order — it runs in ONE partition
    by construction; fine for dimension-sized rights, wrong for two big
    fact tables.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_ts = right_ts or left_ts
    keys = _as_list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys]
    out_names = {c: (c + suffix if c in left.columns else c) for c in right_cols}
    # right payload carried through the window as one struct; the match
    # timestamp rides along for tolerance + exposure
    # default tie = the right timestamp itself; TIMESTAMP_NTZ (parquet
    # default) cannot cast straight to double, so go through unix_micros
    tie = (
        F.col(tie_col).cast("double")
        if tie_col
        else F.unix_micros(F.col(right_ts).cast("timestamp")).cast("double")
    )
    payload = F.struct(
        F.col(right_ts).cast("timestamp").alias("_mts"),
        *[F.col(c).alias(c) for c in right_cols],
    )

    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).cast("timestamp").alias("_ts"),
        F.lit(None).cast("double").alias("_tie"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(
            "struct<_mts:timestamp," + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_cols
            ) + ">"
        ).alias("_r"),
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).cast("timestamp").alias("_ts"),
        tie.alias("_tie"),
        F.lit(0).alias("_is_left"),
        payload.alias("_r"),
    ).select(*l_tag.columns)  # align column order for the union

    u = l_tag.unionByName(r_tag)
    part = [F.col(k) for k in keys] if keys else [F.lit(1)]
    if direction == "backward":
        # right rows sort BEFORE the left row at equal ts (inclusive match);
        # among equal-ts rights the largest tie wins (last in carry order)
        w = (
            Window.partitionBy(*part)
            .orderBy(F.col("_ts").asc(), F.col("_is_left").asc(), F.col("_tie").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("_r", ignorenulls=True).over(w)
    else:
        # forward: left rows sort BEFORE rights at equal ts; earliest right
        # in the frame wins; equal-ts ties pick the largest tie value, the
        # same winner the backward direction picks
        w = (
            Window.partitionBy(*part)
            .orderBy(F.col("_ts").asc(), F.col("_is_left").desc(), F.col("_tie").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        matched = F.first("_r", ignorenulls=True).over(w)

    out = u.withColumn("_m", matched).filter(F.col("_is_left") == 1)
    if tolerance_s is not None:
        gap = F.abs(
            F.col("_ts").cast("double") - F.col("_m._mts").cast("double")
        )
        out = out.withColumn(
            "_m", F.when(gap <= float(tolerance_s), F.col("_m"))
        )
    return out.select(
        *[F.col(c) for c in left.columns],
        F.col("_m._mts").alias("matched_ts"),
        *[F.col(f"_m.{c}").alias(out_names.get(c, c)) for c in right_cols],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str] | None,
    left_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_width_s: int = 3600,
    closed: str = "both",
    how: str = "inner",
    left_id: str | None = None,
) -> DataFrame:
    """Range (interval-containment) join: every (left, right) pair whose
    ``left_ts`` lies inside [start, end] (closed="both"), [start, end)
    ("left"), or (start, end] ("right").

    Scale shape (the part Spark's optimizer will NOT do for you — a naive
    `l.join(r, cond)` with a range-only condition is a broadcast-NL or a
    full cartesian per key): right intervals explode into every
    ``bucket_width_s``-wide time bucket they overlap (sequence over
    floor-div'd epoch micros — pure codegen); left rows compute their one
    bucket; equi-join on (keys…, bucket); exact timestamp filter after.
    Each match surfaces exactly once because the left row's bucket is
    unique. Replication factor = interval_len / bucket_width + 1, so pick
    the width near the median interval length; a degenerate
    interval >> width still costs only its own bucket count, never a
    cross product.
    """
    if closed not in ("both", "left", "right"):
        raise ValueError(f"closed must be both|left|right, got {closed!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if how == "left" and not left_id:
        # full-row anti-join is wrong under NULLs / duplicate rows; demand a key
        raise ValueError("how='left' needs left_id= (a unique left key column)")
    keys = _as_list(on)
    w_us = int(bucket_width_s) * 1_000_000

    lb = F.floor(F.unix_micros(F.col(left_ts).cast("timestamp")) / w_us)
    rb0 = F.floor(F.unix_micros(F.col(start_col).cast("timestamp")) / w_us)
    rb1 = F.floor(F.unix_micros(F.col(end_col).cast("timestamp")) / w_us)

    lt = F.col(f"l.{left_ts}")
    lo, hi = F.col(f"r.{start_col}"), F.col(f"r.{end_col}")
    cond = {
        "both": (lt >= lo) & (lt <= hi),
        "left": (lt >= lo) & (lt < hi),
        "right": (lt > lo) & (lt <= hi),
    }[closed]

    l_side = left.withColumn("_bkt", lb).alias("l")
    r_side = (
        right.withColumn("_bkt", F.explode(F.sequence(rb0, rb1)))
        .alias("r")
    )
    join_on = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in keys] + [
        F.col("l._bkt") == F.col("r._bkt")
    ]
    joined = l_side.join(r_side, join_on, "inner").filter(cond)
    out_cols = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}").alias(c if c not in left.columns else c + "_r")
        for c in right.columns
        if c not in keys
    ]
    inner = joined.select(*out_cols)
    if how == "inner":
        return inner
    # LEFT semantics: union the unmatched left rows back with NULL right cols
    matched_keys = inner.select(left_id).distinct()
    unmatched = left.join(matched_keys, left_id, "left_anti")
    null_right = [
        F.lit(None).cast(right.schema[c].dataType).alias(
            c if c not in left.columns else c + "_r"
        )
        for c in right.columns
        if c not in keys
    ]
    return inner.unionByName(unmatched.select(*left.columns, *null_right))
