"""ngram_decontaminate vs a pure-Python reference: planted overlaps,
too-short docs, hashed-gram equivalence, and broadcast on/off parity."""

from __future__ import annotations

import re

import pytest

from wayproblems_spark.operators.decontam import ngram_decontaminate

N = 3
DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with nine dozen glass jugs"),
    (2, "the quick brown cat naps"),            # shares 'the quick brown'
    (3, "five dozen liquor jugs exactly"),      # shares 2 bench grams
    (4, "xy zz"),                               # shorter than n
    (5, "quick brown fox quick brown fox pads"),  # repeated hit gram
]
BENCH = [
    (0, "watch the quick brown fox leap"),
    (1, "we bought five dozen liquor jugs today"),
]


def _tok(t):
    return [w for w in re.sub(r"[^a-z0-9\s]", "", t.lower()).split() if w]


def _grams(toks, n=N):
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _ref():
    bench = set()
    for _, t in BENCH:
        bench.update(_grams(_tok(t)))
    out = {}
    for i, t in DOCS:
        hits = [g for g in _grams(_tok(t)) if g in bench]
        out[i] = (len(hits), len(set(hits)), bool(hits))
    return out


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "bid long, text string")
    return docs, bench


def _run(docs, bench, **kw):
    return {
        r["doc_id"]: (r["n_hits"], r["n_distinct_hit_grams"], r["contaminated"])
        for r in ngram_decontaminate(docs, bench, n=N, **kw).collect()
    }


def test_matches_reference(frames):
    docs, bench = frames
    assert _run(docs, bench) == _ref()


def test_reference_is_nontrivial():
    ref = _ref()
    assert ref[0][2] and ref[2][2] and ref[3][2] and ref[5][2]
    assert not ref[1][2] and not ref[4][2]
    assert ref[5][0] == 2 and ref[5][1] == 1  # repeated gram counted twice


def test_hashed_and_shuffle_paths_agree(frames):
    docs, bench = frames
    base = _run(docs, bench)
    assert _run(docs, bench, hash_grams=True) == base
    assert _run(docs, bench, broadcast_bench=False) == base


def test_n_guard(frames):
    docs, bench = frames
    with pytest.raises(ValueError):
        ngram_decontaminate(docs, bench, n=0)
