"""Streaming kNN: assign each incoming point (a Structured-Streaming
source) to its nearest way, against a STATIC way corpus.

Shape: the tiered kNN operator needs driver actions per batch (the
escalation ladder's existence probes, the brute-tail short-circuit), so
it cannot run as a single continuous streaming transformation — the
standard Spark pattern for that is ``foreachBatch``: the static side
(grid-keyed vertex frame + per-cell index) is built ONCE with
``build_knn_index`` and captured by the batch closure; every micro-batch
then pays only for its own points (tier-1 equi-join against the persisted
index, escalation only for its own escapees).

Delivery semantics are foreachBatch's usual at-least-once; downstream
sinks overwrite per (batch_id) or dedup on point_id for exactly-once.

Scale: identical to the batch operator per micro-batch; the index is
shared across all batches (persist single-node, ``materialize_dir=`` for
the cluster-scale bucketed-parquet form).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from ..operators.knn import build_knn_index, knn_nearest_way


def knn_foreach_batch(
    resolved_ways: DataFrame,
    level: int | None = 12,
    materialize_dir: str | None = None,
    coarse_level: int | None = None,
) -> Callable:
    """Returns an on-batch callable for ``writeStream.foreachBatch`` that
    maps a micro-batch of points(point_id, lat, lon) to assignment rows
    and returns them to the wrapped sink function set via ``.sink``.

    Usage::

        fb = knn_foreach_batch(ways, level=12)
        fb.sink = lambda df, bid: df.write.mode("append").parquet(out)
        stream.writeStream.foreachBatch(fb).start()
    """
    prebuilt = build_knn_index(resolved_ways, level, materialize_dir)

    def fb(batch_df: DataFrame, batch_id: int) -> None:
        res = knn_nearest_way(
            batch_df, None, coarse_level=coarse_level, prebuilt=prebuilt
        )
        fb.sink(res, batch_id)

    fb.sink = lambda df, bid: None
    return fb
