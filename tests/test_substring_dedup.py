"""repeated_spans / strip_repeated_spans vs a pure-Python reference."""

from __future__ import annotations

from collections import Counter

from wayproblems_spark.operators.substring_dedup import (
    repeated_spans,
    strip_repeated_spans,
)


# ---------------------------------------------------------------- reference
def _ref_spans(docs: dict[int, str], k: int) -> dict[int, list[tuple[int, int]]]:
    grams: Counter = Counter()
    for t in docs.values():
        toks = t.split()
        for i in range(len(toks) - k + 1):
            grams[" ".join(toks[i : i + k])] += 1
    out: dict[int, list[tuple[int, int]]] = {}
    for d, t in docs.items():
        toks = t.split()
        cov = [
            i
            for i in range(len(toks) - k + 1)
            if grams[" ".join(toks[i : i + k])] >= 2
        ]
        spans: list[list[int]] = []
        for p in cov:
            if spans and p - spans[-1][2] <= k:
                spans[-1][1] = p + k
                spans[-1][2] = p
            else:
                spans.append([p, p + k, p])
        if spans:
            out[d] = [(s, e) for s, e, _ in spans]
    return out


def _ref_strip(docs: dict[int, str], k: int) -> dict[int, str]:
    spans = _ref_spans(docs, k)
    out = {}
    for d, t in docs.items():
        toks = t.split()
        drop = set()
        for s, e in spans.get(d, []):
            drop.update(range(s, e))
        out[d] = " ".join(tok for i, tok in enumerate(toks) if i not in drop)
    return out


BANNER = "subscribe to our newsletter for weekly updates and offers"  # 9 toks
PHRASE = "the quick brown fox jumps over the lazy dog"


def _docs() -> dict[int, str]:
    s1 = "alpha beta gamma delta"            # shared k=4 gram (docs 6,7)
    s2 = "epsilon zeta eta theta"            # another shared gram (docs 6,8)
    return {
        0: f"{BANNER} unique tail zero one two three",
        1: f"intro words here {BANNER} and some closing text",
        2: f"{PHRASE} filler mid section {PHRASE} end",   # self-repeat
        3: "completely original text with no duplication at all whatsoever",
        4: "tiny doc",                                    # shorter than k
        5: "",                                            # empty
        6: f"{s1} {s2} trailer x y z",                    # gap == k → one island
        7: f"{s1} pad1 pad2 pad3 pad4 qqq",               # partner for s1
        8: f"www {s2} pad5 pad6 pad7",                    # partner for s2
        9: f"start {s1} XuniqX {s1} finish",              # gap k+1 → two islands
    }


K = 4


def test_reference_islands_shape():
    exp = _ref_spans(_docs(), K)
    # doc 6: covered starts 0 and 4 (gap == k) merge into one island [0, 8)
    assert exp[6] == [(0, 8)]
    # doc 9: covered starts 1 and 6 (gap k+1) stay two islands
    assert exp[9] == [(1, 5), (6, 10)]
    # self-repeat doc 2 has both occurrences covered
    assert 2 in exp and len(exp[2]) == 2
    assert 3 not in exp and 4 not in exp and 5 not in exp


def _spark_docs(spark):
    return spark.createDataFrame(
        list(_docs().items()), "doc_id long, text string"
    )


def _collect_spans(df):
    return {
        d: sorted((r["span_start"], r["span_end"]) for r in rows)
        for d, rows in _group(df.collect()).items()
    }


def _group(rows):
    out: dict[int, list] = {}
    for r in rows:
        out.setdefault(r["doc_id"], []).append(r)
    return out


def test_repeated_spans_matches_reference(spark):
    got = _collect_spans(repeated_spans(_spark_docs(spark), k=K))
    exp = {d: sorted(v) for d, v in _ref_spans(_docs(), K).items()}
    assert got == exp


def test_hash_grams_parity(spark):
    plain = _collect_spans(repeated_spans(_spark_docs(spark), k=K))
    hashed = _collect_spans(
        repeated_spans(_spark_docs(spark), k=K, hash_grams=True)
    )
    assert plain == hashed


def test_strip_matches_reference(spark):
    got = {
        r["doc_id"]: r["text"]
        for r in strip_repeated_spans(_spark_docs(spark), k=K).collect()
    }
    exp = _ref_strip(_docs(), K)
    # docs WITHOUT spans keep their original text byte-for-byte (including
    # any original whitespace); docs with spans are rebuilt token-joined
    ref_spans = _ref_spans(_docs(), K)
    for d, t in _docs().items():
        if d in ref_spans:
            assert got[d] == exp[d], d
        else:
            assert got[d] == t, d


def test_strip_with_precomputed_spans(spark):
    docs = _spark_docs(spark)
    spans = repeated_spans(docs, k=K)
    a = strip_repeated_spans(docs, k=K).collect()
    b = strip_repeated_spans(docs, k=K, spans=spans).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
