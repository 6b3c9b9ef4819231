"""Connected components / near-dup grouping vs a pure-python union-find
oracle, including a long-chain worst case for the iteration bound."""

from __future__ import annotations

import numpy as np

from wayproblems_spark.operators.components import (
    connected_components,
    near_dup_groups,
)


def _union_find(edges):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min member
    comp: dict = {}
    for v in list(parent):
        r = find(v)
        comp.setdefault(r, []).append(v)
    out = {}
    for members in comp.values():
        m = min(members)
        for v in members:
            out[v] = m
    return out


def _check(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["id"]: r["component_id"] for r in connected_components(df).collect()
    }
    assert got == _union_find(edges)


def test_components_random_vs_union_find(spark):
    rng = np.random.RandomState(11)
    edges = [
        (int(rng.randint(0, 400)), int(rng.randint(0, 400))) for _ in range(300)
    ]
    _check(spark, edges)


def test_components_chain_and_stars(spark):
    # 40-long chain (worst diameter for label propagation) + two stars
    edges = [(i, i + 1) for i in range(100, 140)]
    edges += [(500, 500 + i) for i in range(1, 12)]
    edges += [(700 + i, 700) for i in range(1, 8)]
    _check(spark, edges)


def test_near_dup_groups_keeper(spark):
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    pairs = spark.createDataFrame([(1, 4), (4, 7), (2, 9)], "a long, b long")
    got = {r["doc_id"]: r["keeper_id"] for r in near_dup_groups(docs, pairs).collect()}
    assert got == {0: 0, 1: 1, 4: 1, 7: 1, 2: 2, 9: 2, 3: 3, 5: 5, 6: 6, 8: 8}


def test_components_raises_on_nonconvergence(spark):
    """A chain longer than max_iter rounds must raise, not silently
    return partially-propagated labels (ADVICE r3)."""
    import pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "a long, b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=3)
    # and with enough rounds the same chain is one component
    out = connected_components(chain, max_iter=20)
    assert {r["component_id"] for r in out.collect()} == {0}


def test_canonical_docs_quality_argmax_and_ties(spark):
    """Keeper = max quality per group; exact ties -> min id; singletons
    keep themselves; `kept` true exactly once per group."""
    from wayproblems_spark.operators.components import canonical_docs

    docs = spark.createDataFrame(
        [
            (1, 0.5), (4, 0.9), (7, 0.9),   # group {1,4,7}: tie 4/7 -> 4
            (2, 0.1), (9, 0.8),             # group {2,9}: 9 wins over min-id 2
            (3, 0.0),                       # singleton
        ],
        "doc_id long, quality double",
    )
    pairs = spark.createDataFrame([(1, 4), (4, 7), (2, 9)], "a long, b long")
    rows = canonical_docs(docs, pairs).collect()
    keeper = {r["doc_id"]: r["keeper_id"] for r in rows}
    kept = {r["doc_id"]: r["kept"] for r in rows}
    assert keeper == {1: 4, 4: 4, 7: 4, 2: 9, 9: 9, 3: 3}
    assert kept == {1: False, 4: True, 7: False, 2: False, 9: True, 3: True}
