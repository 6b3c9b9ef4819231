"""dsir_weights vs a pure-Python reference LM computation; sign
structure on planted domains; importance_sample determinism and
acceptance formula."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from wayproblems_spark.operators.importance import (
    dsir_weights,
    importance_sample,
)

# corpus: two "domains" — code-flavored and cooking-flavored
DOCS = [
    (0, "def main loop over array index return value"),
    (1, "array index out of range error in loop"),
    (2, "stir the butter and sugar then bake the cake"),
    (3, "bake the bread with flour butter and salt"),
    (4, "loop unrolling makes the array code fast"),
    (5, "whisk eggs with sugar and flour gently"),
]
TARGET = [
    (0, "array loop index pointer return stack heap value"),
    (1, "def return array loop code value"),
]


def _tok(t):
    return [w for w in re.sub(r"[^a-z0-9\s]", "", t.lower()).split() if w]


def _ref_weights():
    cc = Counter(w for _, t in DOCS for w in _tok(t))
    tc = Counter(w for _, t in TARGET for w in _tok(t))
    vocab = set(cc) | set(tc)
    c_tot, t_tot, v = sum(cc.values()), sum(tc.values()), len(vocab)
    out = {}
    for i, t in DOCS:
        w = 0.0
        for term, cnt in Counter(_tok(t)).items():
            w += cnt * (
                math.log(tc[term] + 1)
                - math.log(t_tot + v)
                - math.log(cc[term] + 1)
                + math.log(c_tot + v)
            )
        out[i] = w
    return out


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "tid long, text string")
    return docs, target


def test_weights_match_reference(frames):
    docs, target = frames
    got = {r["doc_id"]: r["weight"] for r in dsir_weights(docs, target).collect()}
    ref = _ref_weights()
    assert set(got) == set(ref)
    for i in ref:
        assert got[i] == pytest.approx(ref[i], abs=2e-6)


def test_sign_structure(frames):
    docs, target = frames
    got = {r["doc_id"]: r["weight"] for r in dsir_weights(docs, target).collect()}
    # code docs score strictly above every cooking doc
    code, cooking = [got[i] for i in (0, 1, 4)], [got[i] for i in (2, 3, 5)]
    assert min(code) > max(cooking)


def test_importance_sample_formula(frames):
    docs, target = frames
    # ln_z = -50: acceptance prob min(1, exp(w+50)) == 1 for every doc
    all_kept = importance_sample(docs, target, ln_z=-50.0)
    assert all_kept.count() == len(DOCS)
    assert "weight" in all_kept.columns
    # ln_z = +50: acceptance ~ exp(-50) -> md5 draw can't land under it
    none_kept = importance_sample(docs, target, ln_z=50.0)
    assert none_kept.count() == 0
    # determinism across repartitionings
    a = sorted(r["doc_id"] for r in importance_sample(docs, target).collect())
    b = sorted(
        r["doc_id"]
        for r in importance_sample(docs.repartition(7), target).collect()
    )
    assert a == b
