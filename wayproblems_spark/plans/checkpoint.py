"""G8 — checkpoint/lineage: resumable bucketed runs.

north_rule: "resumable from checkpoint with per-partition lineage + metrics".

Work is keyed by a deterministic bucket (``pmod(xxhash64(key), n_buckets)``).
Each completed bucket appends one JSONL record
``{bucket, rows, fingerprint, input_fingerprint}`` to the checkpoint log.
Resume = read the log, anti-join completed buckets, process the remainder.
The fingerprint is an order-insensitive content hash so a resumed run can be
verified identical to a one-shot run.

The log is a directory of JSONL files (one per completed bucket) — atomic at
bucket granularity, safe under concurrent executors writing distinct buckets,
and trivially portable to an object store.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_bucket(df: DataFrame, key_col: str, n_buckets: int, out: str = "bucket") -> DataFrame:
    return df.withColumn(out, F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int"))


def content_fingerprint(df: DataFrame) -> int:
    """Order-insensitive content hash of all rows (bit-stability checks)."""
    h = df.select(
        F.xxhash64(*[F.col(c).cast("string") for c in df.columns]).alias("h")
    )
    # decimal(38,0) sums: overflow-free far beyond 10^12 rows (ANSI-safe)
    row = h.agg(
        F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
        F.count("*").alias("n"),
        F.sum((F.abs("h") % F.lit(1_000_000_007)).cast("decimal(38,0)")).alias("m"),
    ).collect()[0]
    return hash((int(row["s"] or 0), int(row["n"]), int(row["m"] or 0)))


class CheckpointLog:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def completed(self) -> dict[int, dict]:
        out = {}
        for name in sorted(os.listdir(self.path)):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(self.path, name)) as f:
                rec = json.load(f)
            out[rec["bucket"]] = rec
        return out

    def mark(self, bucket: int, rows: int, fingerprint: int, extra: dict | None = None):
        rec = {"bucket": bucket, "rows": rows, "fingerprint": fingerprint}
        rec.update(extra or {})
        tmp = os.path.join(self.path, f".bucket_{bucket:05d}.tmp")
        dst = os.path.join(self.path, f"bucket_{bucket:05d}.json")
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, dst)  # atomic publish


def run_bucketed(
    df: DataFrame,
    key_col: str,
    n_buckets: int,
    transform,
    log: CheckpointLog,
    output_dir: str,
    fail_after: int | None = None,
) -> list[int]:
    """Process bucket-by-bucket with per-bucket checkpointing; returns the
    buckets processed THIS run. ``fail_after`` simulates a mid-job kill for
    resume tests. Output is parquet partitioned by bucket.

    At cluster scale each "bucket" is a partition-set-sized unit (hundreds
    of Spark tasks); the driver loop is over buckets, not rows.
    """
    bdf = with_bucket(df, key_col, n_buckets)
    done = set(log.completed())
    processed = []
    for b in range(n_buckets):
        if b in done:
            continue
        part = bdf.filter(F.col("bucket") == b).drop("bucket")
        result = transform(part)
        out_path = os.path.join(output_dir, f"bucket={b}")
        result.write.mode("overwrite").parquet(out_path)
        # count + fingerprint from the written files: one compute pass total
        written = part.sparkSession.read.parquet(out_path)
        n = written.count()
        fp = content_fingerprint(written)
        log.mark(b, n, fp)
        processed.append(b)
        if fail_after is not None and len(processed) >= fail_after:
            break
    return processed
