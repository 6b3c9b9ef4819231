"""Document chunking into fixed-size training windows with overlap.

LLM training corpora are consumed as context windows, not documents — the
pipeline step between "curated corpus" and "tokenized shards" splits each
document's token stream into ``target`` -sized windows advancing by
``target − overlap`` tokens. This is a pure array-expression operator:
tokenize once, synthesize chunk starts with ``sequence``, ``slice`` out
each window — whole-stage codegen end to end, zero Python, zero shuffle
(the explode multiplies rows inside the scan stage).

Chunk-count contract (mirrors the common tokenizer-sharding convention):
  n ≤ target  → 1 chunk (the whole document, even if shorter)
  n > target  → 1 + ceil((n − target) / step) chunks, so the LAST window
                ends exactly at-or-past the final token and no window is
                a subset of its predecessor (a naive "start while < n"
                loop emits a degenerate overlap-contained tail).
Empty documents (0 tokens) produce no chunks.

All arithmetic is integer, so a SQL engine reproduces chunk boundaries
exactly (q42); the tokenizer is the q32-locked normalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ranking import _toks


def chunk_documents(
    docs: DataFrame,
    target: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_idx, n_tokens, chunk_text) — see module docstring."""
    if not 0 <= overlap < target:
        raise ValueError(f"need 0 <= overlap < target, got {overlap}/{target}")
    step = target - overlap
    toks = _toks(F.col(text_col))
    n = F.size(F.col("_toks"))
    # integer ceil((n - target)/step) via floor((n - target + step - 1)/step)
    # — int-valued doubles are exact far past any document length. Empty
    # docs are filtered BEFORE the explode: sequence(0, -1) would DESCEND
    # (Spark picks step -1 when start > stop), not produce zero rows.
    n_chunks = (
        F.when(n <= target, F.lit(1))
        .otherwise(1 + F.floor((n - target + (step - 1)) / F.lit(step)))
        .cast("int")
    )
    chunk = F.slice(
        F.col("_toks"), F.col("chunk_idx") * step + 1, target
    )
    return (
        docs.select(F.col(id_col), toks.alias("_toks"))
        .filter(F.size("_toks") > 0)
        .select(
            id_col,
            "_toks",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.size(chunk).alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )
