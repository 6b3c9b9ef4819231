"""Exactly-once streaming ingest into the Iceberg-style snapshot table.

The brief's input table GROWS (a Common-Crawl-style crawl is an ingest
stream); this sink turns a Structured Streaming source into versioned
snapshot-table commits:

    fb = snapshot_ingest_sink("/data/pages_tbl", stats_cols=("page_id",))
    stream.writeStream.foreachBatch(fb).start()

Exactly-once: every commit records its micro-batch id in the manifest's
``properties`` (the Iceberg snapshot-summary pattern). Structured
Streaming's at-least-once replay re-delivers the LAST batch after a
crash between the table commit and the checkpoint commit; the sink sees
the batch_id already in the retained history and skips — no duplicate
rows, no torn table (the commit itself is an atomic pointer flip).

Retention contract: ``expire_snapshots`` must keep at least the last 2
versions (its default) — replays only ever target the newest or
second-newest commit, so the idempotence scan never needs expired
manifests. Readers meanwhile get snapshot isolation for free: a batch
landing mid-read is invisible until the reader re-resolves VERSION.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from ..sources.snapshot_table import (
    append_snapshot,
    create_snapshot_table,
    current_version,
    read_manifest,
    snapshot_history,
)


def committed_batch_ids(path: str) -> set[int]:
    """batch_ids recorded by the retained manifests (newest wins on a
    compacted/expired table — see the retention contract above)."""
    out = set()
    for h in snapshot_history(path):
        b = read_manifest(path, h["version"]).get("properties", {}).get("batch_id")
        if b is not None:
            out.add(int(b))
    return out


def snapshot_ingest_sink(
    table_path: str,
    stats_cols: tuple = (),
    n_files: int | None = None,
) -> Callable:
    """foreachBatch callable: one snapshot commit per micro-batch,
    replay-idempotent via the manifest-recorded batch_id."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        spark = batch_df.sparkSession
        if current_version(table_path) == 0:
            create_snapshot_table(
                spark, table_path, batch_df, stats_cols=stats_cols,
                n_files=n_files, properties={"batch_id": bid},
            )
            return
        if bid in committed_batch_ids(table_path):
            return  # replayed batch: its rows are already committed
        append_snapshot(
            spark, table_path, batch_df, n_files=n_files,
            properties={"batch_id": bid},
        )

    return sink
