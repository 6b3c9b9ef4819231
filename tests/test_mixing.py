"""Source-weighted mixing (operators/mixing.py) vs a pure-Python
recompute of the exact same float composition and md5 draws, plus the
structural contracts: proportions hit the target, upsampling emits full
epochs + a frozen partial epoch, decisions survive repartitioning, and
unsatisfiable mixes raise."""

from __future__ import annotations

import hashlib
import re

import pytest

TOK = re.compile(r"[^a-z0-9\s]")


def _ntoks(text: str) -> int:
    return len([t for t in TOK.sub("", text.lower()).split() if t])


def _u32(salt: str, key) -> int:
    return int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:8], 16)


# three sources with very different token mass: web is abundant (gets
# downsampled), books scarce (gets upsampled), code mid
ROWS = [
    *[(i, "the quick web page text " + "w " * (i % 7), "web") for i in range(60)],
    *[(100 + i, "a rare book paragraph", "books") for i in range(6)],
    *[(200 + i, "def f x return x plus one", "code") for i in range(20)],
    (900, "unweighted source row", "junk"),
]
WEIGHTS = {"web": 0.5, "books": 0.25, "code": 0.25}


def _df(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string, source string")


def _py_mix(weights, total_tokens, max_epochs, salt="mix"):
    totals = {}
    for _, text, s in ROWS:
        if s in weights:
            totals[s] = totals.get(s, 0) + _ntoks(text)
    w_sum = sum(weights.values())
    norm = {s: w / w_sum for s, w in weights.items()}
    caps = [max_epochs * totals[s] / norm[s] for s in weights]
    n = min(caps)
    if total_tokens is not None:
        n = min(n, float(total_tokens))
    rates = {s: norm[s] * n / totals[s] for s in weights}
    copies = {}
    for doc_id, _, s in ROWS:
        if s not in weights:
            continue
        r = rates[s]
        nf = int(r)
        extra = 1 if _u32(salt, doc_id) < int((r - nf) * 2**32) else 0
        if nf + extra > 0:
            copies[doc_id] = nf + extra
    return n, rates, copies


def test_mix_matches_python_reference(spark):
    from wayproblems_spark.operators.mixing import _mix_rates, mix_sources

    mixed, stats = mix_sources(_df(spark), WEIGHTS, max_epochs=3.0)
    n, rates, copies = _py_mix(WEIGHTS, None, 3.0)
    assert stats["_target_tokens"] == n
    for s, r in rates.items():
        assert stats[s]["rate"] == r  # bit-exact, same composition

    got = {}
    for row in mixed.collect():
        got.setdefault(row["doc_id"], []).append(row["epoch"])
    assert {k: len(v) for k, v in got.items()} == copies
    for doc_id, epochs in got.items():
        assert sorted(epochs) == list(range(copies[doc_id]))
    # the unweighted source is dropped entirely
    assert 900 not in got


def test_upsampling_and_proportions(spark):
    from wayproblems_spark.operators.mixing import mix_sources

    mixed, stats = mix_sources(_df(spark), WEIGHTS, max_epochs=3.0)
    # books is the scarcest source relative to its weight -> pinned at
    # max_epochs; every books row appears exactly 3 times
    assert stats["books"]["rate"] == pytest.approx(3.0)
    assert stats["books"]["epochs_full"] == 3
    from pyspark.sql import functions as F

    per_src = {
        r["source"]: r["t"]
        for r in mixed.groupBy("source")
        .agg(F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t"))
        .collect()
    }
    tot = sum(per_src.values())
    # achieved token shares within sampling noise of the target weights
    for s, w in WEIGHTS.items():
        assert per_src[s] / tot == pytest.approx(w, abs=0.08), (s, per_src)


def test_total_tokens_cap_and_determinism(spark):
    from wayproblems_spark.operators.mixing import mix_sources

    df = _df(spark)
    mixed1, stats = mix_sources(df, WEIGHTS, total_tokens=120, max_epochs=3.0)
    assert stats["_target_tokens"] == 120.0
    exp = sum(stats[s]["expected_tokens"] for s in WEIGHTS)
    assert exp == pytest.approx(120.0, rel=1e-9)

    mixed2, _ = mix_sources(
        df.repartition(7), WEIGHTS, total_tokens=120, max_epochs=3.0
    )
    a = sorted((r["doc_id"], r["epoch"]) for r in mixed1.collect())
    b = sorted((r["doc_id"], r["epoch"]) for r in mixed2.collect())
    assert a == b and len(a) > 0


def test_validation_errors(spark):
    from wayproblems_spark.operators.mixing import mix_sources

    df = _df(spark)
    with pytest.raises(ValueError, match="non-empty"):
        mix_sources(df, {})
    with pytest.raises(ValueError, match="positive"):
        mix_sources(df, {"web": -1.0})
    with pytest.raises(ValueError, match="max_epochs"):
        mix_sources(df, WEIGHTS, max_epochs=0.5)
    with pytest.raises(ValueError, match="absent"):
        mix_sources(df, {"web": 0.5, "nosuch": 0.5})


def test_token_count_col_override(spark):
    from pyspark.sql import functions as F

    from wayproblems_spark.operators.mixing import mix_sources

    df = _df(spark).withColumn("bpe", F.length("text"))
    _, stats = mix_sources(df, WEIGHTS, token_count_col="bpe")
    py_tot = {}
    for _, text, s in ROWS:
        if s in WEIGHTS:
            py_tot[s] = py_tot.get(s, 0) + len(text)
    for s in WEIGHTS:
        assert stats[s]["tokens"] == py_tot[s]


def test_join_rates_path_matches_case_path(spark):
    """The broadcast-join decision path (the >64-source shape) must make
    bit-identical choices to the literal-CASE path."""
    from wayproblems_spark.operators.mixing import mix_sources

    df = _df(spark)
    a, sa = mix_sources(df, WEIGHTS, max_epochs=3.0, use_join_rates=False)
    b, sb = mix_sources(df, WEIGHTS, max_epochs=3.0, use_join_rates=True)
    ka = sorted((r["doc_id"], r["epoch"]) for r in a.collect())
    kb = sorted((r["doc_id"], r["epoch"]) for r in b.collect())
    assert ka == kb and len(ka) > 0
    assert {s: sa[s]["rate"] for s in WEIGHTS} == {
        s: sb[s]["rate"] for s in WEIGHTS
    }
