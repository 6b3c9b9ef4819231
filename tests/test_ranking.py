"""TF-IDF / BM25 vs a pure-Python reference implementation."""

from __future__ import annotations

import math
import re

import pytest

from wayproblems_spark.operators.ranking import (
    bm25_score,
    bm25_topk,
    doc_frequencies,
    doc_lengths,
    tfidf_vectors,
)

DOCS = [
    (0, "The quick brown fox jumps over the lazy dog"),
    (1, "A fast brown fox; a quick clever fox!"),
    (2, "dogs and foxes are not the same animal"),
    (3, "quick quick quick — repetition saturates term frequency"),
    (4, ""),
    (5, "entirely unrelated text about spark shuffles and codegen"),
    (6, "the dog sat. the dog slept. the dog barked at the fox."),
]
QUERY = ["quick", "fox", "dog"]


def _tok(text):
    return [t for t in re.sub(r"[^a-z0-9\s]", "", text.lower()).split() if t]


def _py_bm25(query, k1=1.2, b=0.75):
    toks = {i: _tok(t) for i, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {
        q: sum(1 for v in toks.values() if q in v) for q in query
    }
    out = {}
    for i, v in toks.items():
        s = 0.0
        for q in query:
            tf = v.count(q)
            if not tf:
                continue
            idf = math.log(1.0 + (n - dfreq[q] + 0.5) / (dfreq[q] + 0.5))
            sat = (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * len(v) / avgdl))
            s += idf * sat
        if s:
            out[i] = s
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_doc_lengths_and_df(docs_df):
    dl = {r["doc_id"]: r["dl"] for r in doc_lengths(docs_df).collect()}
    assert dl == {i: len(_tok(t)) for i, t in DOCS}
    dfreq = {
        r["term"]: r["df"]
        for r in doc_frequencies(docs_df, terms=QUERY).collect()
    }
    assert dfreq == {"quick": 3, "fox": 3, "dog": 2}


def test_bm25_matches_python(docs_df):
    got = {r["doc_id"]: r["score"] for r in bm25_score(docs_df, QUERY).collect()}
    exp = _py_bm25(QUERY)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i] == pytest.approx(exp[i], abs=1e-9), i


def test_bm25_topk_order(docs_df):
    rows = bm25_topk(docs_df, QUERY, k=3).collect()
    exp = sorted(_py_bm25(QUERY).items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [(r["doc_id"]) for r in rows] == [i for i, _ in exp]
    # scores descend
    assert rows[0]["score"] >= rows[1]["score"] >= rows[2]["score"]


def test_tfidf_vectors(docs_df):
    got = {
        (r["doc_id"], r["term"]): r["tfidf"]
        for r in tfidf_vectors(docs_df).collect()
    }
    toks = {i: _tok(t) for i, t in DOCS}
    n = len(DOCS)
    # spot-check the full formula on a repeated term and a hapax
    for doc, term in ((3, "quick"), (5, "codegen"), (6, "the")):
        tf = toks[doc].count(term)
        df = sum(1 for v in toks.values() if term in v)
        exp = (1.0 + math.log(tf)) * (math.log((1.0 + n) / (1.0 + df)) + 1.0)
        assert got[(doc, term)] == pytest.approx(exp, abs=1e-12)
    # empty doc contributes nothing
    assert not any(d == 4 for d, _ in got)
    # min_df prunes hapaxes
    pruned = tfidf_vectors(docs_df, min_df=2)
    terms = {r["term"] for r in pruned.collect()}
    assert "codegen" not in terms and "fox" in terms
