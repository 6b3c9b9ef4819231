"""pack_sequences invariants + a pure-Python reference of the sharded
concat-and-split mapping."""

from __future__ import annotations

from collections import defaultdict

import pytest

from wayproblems_spark.operators.packing import pack_sequences

BUDGET, SHARDS = 16, 3

# (doc_id, chunk_idx, n_tokens) — includes budget-straddlers, an
# exact-boundary chunk, a chunk longer than the whole budget, and a zero
CHUNKS = [
    (0, 0, 5), (0, 1, 7),
    (1, 0, 16),           # exactly one budget
    (2, 0, 40),           # straddles 3 sequences on its own
    (3, 0, 3), (3, 1, 0), (3, 2, 9),
    (4, 0, 11), (5, 0, 2), (6, 0, 13), (7, 0, 6), (8, 0, 21),
]


def _py_pack():
    by_shard = defaultdict(list)
    for d, c, n in sorted(CHUNKS):
        if n > 0:
            by_shard[d % SHARDS].append((d, c, n))
    rows = []
    for shard, items in by_shard.items():
        cum = 0
        for d, c, n in items:
            start, cum = cum, cum + n
            s0, s1 = start // BUDGET, (cum - 1) // BUDGET
            for s in range(s0, s1 + 1):
                lo = max(start, s * BUDGET)
                hi = min(cum, (s + 1) * BUDGET)
                rows.append((shard, s, d, c, lo - start, hi - start, lo - s * BUDGET))
    return sorted(rows)


@pytest.fixture(scope="module")
def packed(spark):
    df = spark.createDataFrame(
        CHUNKS, "doc_id long, chunk_idx long, n_tokens long"
    )
    return sorted(map(tuple, pack_sequences(df, BUDGET, SHARDS).collect()))


def test_packing_matches_reference(packed):
    assert packed == _py_pack()


def test_packing_invariants(packed):
    # every token of every non-empty chunk lands exactly once
    per_chunk = defaultdict(list)
    for shard, seq, d, c, lo, hi, pos in packed:
        per_chunk[(d, c)].append((lo, hi))
    for (d, c, n) in CHUNKS:
        spans = sorted(per_chunk.get((d, c), []))
        if n == 0:
            assert spans == []
            continue
        assert spans[0][0] == 0 and spans[-1][1] == n
        for (a, b), (a2, _) in zip(spans, spans[1:]):
            assert b == a2  # contiguous, no gap/overlap
    # sequences tile [0, budget) without gaps; all but each shard's last are full
    seq_fill = defaultdict(list)
    for shard, seq, d, c, lo, hi, pos in packed:
        seq_fill[(shard, seq)].append((pos, pos + (hi - lo)))
    for (shard, seq), spans in seq_fill.items():
        spans.sort()
        assert spans[0][0] == 0
        for (a, b), (a2, _) in zip(spans, spans[1:]):
            assert b == a2
        last = max(s for sh, s in seq_fill if sh == shard)
        if seq < last:
            assert spans[-1][1] == BUDGET


def test_packing_param_guard(spark):
    df = spark.createDataFrame(CHUNKS[:1], "doc_id long, chunk_idx long, n_tokens long")
    with pytest.raises(ValueError):
        pack_sequences(df, 0)
