"""Sample packing: map chunk token-streams onto fixed-budget training
sequences (the "concatenate, then split every `budget` tokens" convention
LLM trainers use so no sequence wastes pad tokens).

Distributed shape: a GLOBAL concatenation order is a single-partition
window — a non-starter at corpus scale — so packing is SHARDED: chunks
are assigned to ``n_shards`` deterministic shards (``doc_id % n_shards``
by default — reproducible and SQL-replicable), concatenated in
(doc_id, chunk_idx) order WITHIN each shard, and split at budget
boundaries there. Each shard's window runs independently (one shuffle,
``n_shards``-way parallel); sequences never cross shards. The output is
a (chunk → sequence, offset-range) mapping — all integer arithmetic, so
an SQL engine reproduces it bit-exactly (q43):

  shard     — packing shard
  seq_id    — sequence ordinal within the shard
  doc_id, chunk_idx — the source chunk
  off_start, off_end — the half-open token range OF THE CHUNK that lands
              in this sequence (a chunk straddling a budget boundary
              emits one row per sequence it touches)
  pos       — where off_start lands inside the sequence

Invariants (test-asserted): every chunk token lands in exactly one
(seq, pos); every sequence except a shard's last holds exactly ``budget``
tokens; positions tile [0, budget) without gaps or overlap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    chunks: DataFrame,
    budget: int,
    n_shards: int = 32,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """See module docstring. Rows with 0 tokens are dropped (they occupy
    no positions). ``budget`` is tokens per training sequence."""
    if budget <= 0 or n_shards <= 0:
        raise ValueError("budget and n_shards must be positive")
    shard = (F.col(id_col) % n_shards).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col), F.col(idx_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = (
        chunks.filter(F.col(tokens_col) > 0)
        .select(shard, id_col, idx_col, F.col(tokens_col).cast("long").alias("_n"))
        .withColumn("_cum", F.sum("_n").over(w))
        .withColumn("_start", F.col("_cum") - F.col("_n"))
    )
    s0 = F.floor(F.col("_start") / budget)
    s1 = F.floor((F.col("_cum") - 1) / budget)
    seq = F.col("seq_id")
    lo = F.greatest(F.col("_start"), seq * budget)
    hi = F.least(F.col("_cum"), (seq + 1) * budget)
    return (
        base.select(
            "shard", id_col, idx_col, "_n", "_start", "_cum",
            F.explode(F.sequence(s0, s1)).alias("seq_id"),
        )
        .select(
            "shard",
            seq,
            id_col,
            idx_col,
            (lo - F.col("_start")).alias("off_start"),
            (hi - F.col("_start")).alias("off_end"),
            (lo - seq * budget).alias("pos"),
        )
    )
