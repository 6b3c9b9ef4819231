"""dedup_paragraphs vs a pure-Python first-occurrence reference."""

from __future__ import annotations

import pytest

from wayproblems_spark.operators.paradedup import dedup_paragraphs

DOCS = [
    (0, "intro\nCOOKIE BANNER\nalpha body\nfooter"),
    (1, "COOKIE BANNER\nbeta body\nfooter"),          # banner+footer dup
    (2, "gamma body\ngamma body\nunique tail"),        # within-doc repeat
    (3, "COOKIE BANNER\nfooter"),                      # fully boilerplate
    (4, ""),                                           # empty doc
    (5, "delta body"),
]


def _ref():
    seen = set()
    out = {}
    for i, t in sorted(DOCS):
        paras = [p for p in t.split("\n") if p != ""]
        kept = []
        for p in paras:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        out[i] = ("\n".join(kept), len(paras), len(kept))
    return out


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        r["doc_id"]: (r["text"], r["n_paras"], r["n_kept"])
        for r in dedup_paragraphs(df).collect()
    }


def test_matches_reference(result):
    assert result == _ref()


def test_structure(result):
    assert result[1] == ("beta body", 3, 1)       # banner+footer removed
    assert result[2] == ("gamma body\nunique tail", 3, 2)  # self-dup gone
    assert result[3] == ("", 2, 0)                # fully boilerplate doc
    assert result[4] == ("", 0, 0)                # empty in, empty out


def test_repartition_stable(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(map(tuple, dedup_paragraphs(df).collect()))
    b = sorted(map(tuple, dedup_paragraphs(df.repartition(5)).collect()))
    assert a == b
