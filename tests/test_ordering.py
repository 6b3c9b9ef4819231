"""Deterministic global shuffle (operators/ordering.py): ranks must be
a 0..n-1 permutation equal to a pure-Python sort of (md5-draw, id),
stable under repartitioning, and the shard interleave must round-robin
the shuffled sequence."""

from __future__ import annotations

import hashlib

import pytest


def _draw(salt: str, key) -> str:
    return hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:8]


ROWS = [(i, f"doc {i}") for i in range(300)]


def _df(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def _py_ranks(salt="shuffle"):
    order = sorted((i for i, _ in ROWS), key=lambda i: (_draw(salt, i), i))
    return {doc_id: rank for rank, doc_id in enumerate(order)}


def test_rank_matches_python_sort(spark):
    from wayproblems_spark.operators.ordering import shuffle_corpus

    got = {
        r["doc_id"]: r["shuffle_rank"]
        for r in shuffle_corpus(_df(spark)).collect()
    }
    assert got == _py_ranks()
    assert sorted(got.values()) == list(range(len(ROWS)))


def test_rank_repartition_stable_and_salted(spark):
    from wayproblems_spark.operators.ordering import shuffle_corpus

    df = _df(spark)
    a = {r["doc_id"]: r["shuffle_rank"] for r in shuffle_corpus(df).collect()}
    b = {
        r["doc_id"]: r["shuffle_rank"]
        for r in shuffle_corpus(df.repartition(13)).collect()
    }
    assert a == b
    c = {
        r["doc_id"]: r["shuffle_rank"]
        for r in shuffle_corpus(df, salt="other").collect()
    }
    assert c == _py_ranks("other")
    assert c != a  # a different salt is a different permutation


def test_interleave_shards(spark):
    from wayproblems_spark.operators.ordering import interleave_shards

    out = interleave_shards(_df(spark), 4).collect()
    ranks = _py_ranks()
    for r in out:
        assert r["shard"] == ranks[r["doc_id"]] % 4
        assert r["pos"] == ranks[r["doc_id"]] // 4
    # every shard is a contiguous 0..k position sequence
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard

    with pytest.raises(ValueError, match="n_shards"):
        interleave_shards(_df(spark), 0)


def test_no_single_partition_stage(spark):
    """The rank plan must not funnel the corpus through one task: no
    global Sort/Window without a partitionBy (the Exchange ahead of the
    window must be hash, not SinglePartition)."""
    from wayproblems_spark.operators.ordering import shuffle_corpus

    plan = shuffle_corpus(_df(spark))._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_bucket_chars_invariant(spark):
    """Any bucket fan-out yields the identical global rank (the bucket
    is a prefix of the sort key at every width)."""
    from wayproblems_spark.operators.ordering import shuffle_corpus

    df = _df(spark)
    base = {
        r["doc_id"]: r["shuffle_rank"] for r in shuffle_corpus(df).collect()
    }
    for chars in (1, 3):
        got = {
            r["doc_id"]: r["shuffle_rank"]
            for r in shuffle_corpus(df, bucket_chars=chars).collect()
        }
        assert got == base, chars

    import pytest as _pt

    with _pt.raises(ValueError, match="bucket_chars"):
        shuffle_corpus(df, bucket_chars=0)
