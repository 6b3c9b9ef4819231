"""repetition_stats/repetition_filter vs an independent Counter-based
reference, including the deterministic tie rule and single-token NULLs."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from wayproblems_spark.operators.quality import (
    repetition_filter,
    repetition_stats,
)

DOCS = [
    (0, "The cat sat. The cat sat! a b c d e f"),   # repeated opener
    (1, "spam spam spam spam eggs"),                 # dominated by one token
    (2, "go go go go go go"),                        # one distinct bigram
    (3, "solo"),                                     # single token
    (4, ""),                                         # empty -> no row
    (5, "a b a b c d e f g h"),  # top token 2/10 passes; bigram 2/9 fails
    (6, "b a b a a b"),                              # bigram count tie -> 'a b'
]


def _tok(t):
    return [w for w in re.sub(r"[^a-z0-9\s]", "", t.lower()).split() if w]


def _ref():
    rows = {}
    for i, t in DOCS:
        toks = _tok(t)
        if not toks:
            continue
        uni = Counter(toks)
        top_tok, top_cnt = min(uni.items(), key=lambda kv: (-kv[1], kv[0]))
        bis = Counter(
            " ".join(p) for p in zip(toks, toks[1:])
        )
        if bis:
            tb, tbc = min(bis.items(), key=lambda kv: (-kv[1], kv[0]))
            nb = sum(bis.values())
            brow = (nb, len(bis) / nb, tb, tbc / nb)
        else:
            brow = (0, None, None, None)
        rows[i] = (len(toks), top_tok, top_cnt / len(toks)) + brow
    return rows


@pytest.fixture(scope="module")
def stats(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r["doc_id"]: r for r in repetition_stats(df).collect()}


def test_stats_match_reference(stats):
    ref = _ref()
    assert set(stats) == set(ref)
    for i, (nt, tt, ttf, nb, dbf, tb, tbf) in ref.items():
        r = stats[i]
        assert (r["n_tokens"], r["top_token"], r["n_bigrams"]) == (nt, tt, nb)
        assert r["top_token_frac"] == pytest.approx(ttf)
        for got, want in ((r["distinct_bigram_frac"], dbf),
                          (r["top_bigram_frac"], tbf)):
            assert (got is None) == (want is None)
            if want is not None:
                assert got == pytest.approx(want)
        assert r["top_bigram"] == tb


def test_tie_breaks_to_smallest_gram(stats):
    # doc 6: bigrams b-a x2, a-b x2, a-a x1 -> tie between 'a b' and 'b a'
    assert stats[6]["top_bigram"] == "a b"


def test_filter_reasons(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_filter(df).collect()}
    assert out[3]["reject_reason"] == "too_short"          # 1 token
    assert out[1]["reject_reason"] == "top_token"          # spam 4/5
    # doc 5: top token 2/10 = 0.2 (not > 0.2, passes); top bigram 'a b'
    # 2/9 = 0.222 > 0.18 -> the SECOND gate is the reason
    assert out[5]["reject_reason"] == "top_bigram"
    assert not out[1]["keep"]


def test_filter_first_failing_rule_order(spark):
    # doc 2 ('go' x6): passes min_tokens(5), fails top_token first even
    # though every bigram rule also fails -> reason must be 'top_token'
    df = spark.createDataFrame([DOCS[2]], "doc_id long, text string")
    row = repetition_filter(df).collect()[0]
    assert row["reject_reason"] == "top_token"
    assert not row["keep"]
