"""Streaming as-of enrichment: attribute each event in a micro-batch to
the latest prior row of a STATIC (slowly-changing) dimension table.

The classic stream-enrichment shape — clicks against the error/deploy/
config history, fills against the quote book — expressed with the batch
:func:`..operators.temporal.asof_join` inside ``foreachBatch``. The
dimension side is persisted ONCE (it is the slowly-changing side; its
refresh cadence is a restart, same stance as the kNN/PIP/IVF prebuilt
indexes); each micro-batch pays one key shuffle of ITSELF plus the
window carry over (batch ∪ dimension) per key.

Semantics note (why this is correct per batch): the as-of match of a left
row depends only on the RIGHT side and the row itself — never on other
left rows — so enriching batch-by-batch produces exactly the rows the
one-shot batch join over the full stream would (parity-tested). Delivery
is foreachBatch's usual at-least-once at the boundary; pair with
:func:`.knn_stream.exactly_once_parquet_sink` for exactly-once tables.

Scale: the dimension table shuffles once per batch today (Spark cannot
pin a shuffle across jobs); for a large dimension, pre-bucket it by the
key (``spark.read`` of a bucketed table) so only the batch side moves.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from ..operators.temporal import asof_join


def asof_foreach_batch(
    dim: DataFrame,
    on,
    left_ts: str = "ts",
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance_s: float | None = None,
    right_cols: list[str] | None = None,
    tie_col: str | None = None,
) -> Callable:
    """Returns an on-batch callable for ``writeStream.foreachBatch`` that
    as-of-enriches each micro-batch against the persisted ``dim`` frame
    and hands the result to ``.sink``. ``.dim`` exposes the persisted
    frame for unpersist on stream stop.

    Usage::

        fb = asof_foreach_batch(errors, on="user_id")
        fb.sink = exactly_once_parquet_sink(out_dir)
        stream.writeStream.foreachBatch(fb).start()
    """
    dim = dim.persist()

    def fb(batch_df: DataFrame, batch_id: int) -> None:
        res = asof_join(
            batch_df, dim, on=on, left_ts=left_ts, right_ts=right_ts,
            direction=direction, tolerance_s=tolerance_s,
            right_cols=right_cols, tie_col=tie_col,
        )
        fb.sink(res, batch_id)

    fb.sink = lambda df, bid: None
    fb.dim = dim
    return fb
