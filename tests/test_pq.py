"""Product quantization: deterministic encode, ADC == numpy recompute,
rank quality vs brute-force cosine, and the oracle corpus's argmin margins
(the q37 cross-engine guard)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wayproblems_spark.operators.similarity import (
    build_pq_index,
    cosine_topk,
    pq_topk,
    pq_train,
)

SF = "/root/testdata/sf0.01"


def oracle_codebooks(m=4, k=8, dsub=16) -> np.ndarray:
    """The q37 closed-form codebooks: exact same arithmetic as the DuckDB
    side (((j*31 + c*17 + t*7) % 101)/101.0 - 0.5)."""
    j, c, t = np.meshgrid(
        np.arange(m), np.arange(k), np.arange(dsub), indexing="ij"
    )
    return ((j * 31 + c * 17 + t * 7) % 101) / 101.0 - 0.5


def _clustered(spark, n=2000, dim=64):
    c = (F.col("vec_id") % 16).cast("double")
    comps = [
        (
            F.sin(c * F.lit(1.9 + 0.21 * d) + F.lit(0.11 * d))
            + F.lit(0.1) * F.sin(F.col("vec_id").cast("double") * F.lit(0.7 + 0.031 * d))
        ).cast("float")
        for d in range(dim)
    ]
    return spark.range(0, n, 1, 8).select(
        F.col("id").alias("vec_id"), F.array(*comps).alias("embedding")
    )


def test_encode_deterministic_and_in_range(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    cb = oracle_codebooks()
    _, enc1 = build_pq_index(e, dim=64, m=4, k=8, codebooks=cb, normalize=False)
    _, enc2 = build_pq_index(e, dim=64, m=4, k=8, codebooks=cb, normalize=False)
    r1 = sorted((r[0], tuple(r[1])) for r in enc1.collect())
    r2 = sorted((r[0], tuple(r[1])) for r in enc2.collect())
    enc1.unpersist(), enc2.unpersist()
    assert r1 == r2 and len(r1) > 0
    assert all(0 <= c < 8 for _, codes in r1 for c in codes)
    assert all(len(codes) == 4 for _, codes in r1)


def test_oracle_argmin_margins(spark):
    """Cross-engine guard for q37: numpy sums pairwise, DuckDB list_sum
    sequentially — a 1-ulp disagreement only flips the argmin if two
    codeword distances are nearly equal. Assert the runner-up margin is
    astronomically above ulp scale for EVERY (vector, subspace)."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    x = np.array([r[1] for r in e.collect()], dtype=np.float64).reshape(-1, 4, 16)
    cb = oracle_codebooks()
    worst = np.inf
    for j in range(4):
        d = ((x[:, j, None, :] - cb[None, j]) ** 2).sum(-1)
        s = np.sort(d, axis=1)
        worst = min(worst, float((s[:, 1] - s[:, 0]).min()))
    assert worst > 1e-9, worst


def test_adc_matches_numpy(spark):
    corpus = _clustered(spark, n=400)
    cb, enc = build_pq_index(corpus, dim=64, m=8, k=16, iters=4)
    queries = _clustered(spark, n=8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = pq_topk((cb, enc), queries, k=5)
    rows = got.collect()
    assert {r["q_id"] for r in rows} == set(range(8))
    assert all(1 <= r["rank"] <= 5 for r in rows)
    # recompute one query's ADC distances exactly
    codes = {r[0]: np.array(r[1]) for r in enc.collect()}
    qv = np.array(
        [r[1] for r in sorted(queries.collect(), key=lambda r: r[0])], dtype=np.float64
    )
    qv = qv / np.linalg.norm(qv, axis=1, keepdims=True)
    qv = qv.reshape(8, 8, 8)
    lut = ((qv[:, :, None, :] - cb[None]) ** 2).sum(-1)
    for r in rows:
        if r["q_id"] != 3:
            continue
        c = codes[r[1]]
        want = lut[3, np.arange(8), c].sum()
        assert r["adc_dist"] == pytest.approx(want, rel=0, abs=1e-12)
    enc.unpersist()


def test_pq_rank_quality_vs_brute(spark):
    """The production two-stage pipeline: ADC shortlist → exact re-rank.
    The fixture's 16 clusters are deliberately tighter than one PQ cell
    (members share most codes), so pure-ADC ranking inside a cluster is
    tie-broken by id — recall@10 vs brute lands around 0.2-0.3. That is
    the quantization-resolution limit, not a bug; the documented answer
    is rerank_corpus=: shortlist 200 covers the whole 125-member home
    cluster, and the exact pass restores the true order."""
    corpus = _clustered(spark, n=2000)
    queries = _clustered(spark, n=12).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    brute = cosine_topk(corpus, queries, k=10)
    want = {(r["q_id"], r["vec_id"]) for r in brute.collect()}
    cb = pq_train(corpus, dim=64, m=8, k=32, iters=8)
    prebuilt = build_pq_index(corpus, dim=64, codebooks=cb)
    adc_only = {(r["q_id"], r[1]) for r in pq_topk(prebuilt, queries, k=10).collect()}
    reranked = pq_topk(
        prebuilt, queries, k=10, rerank_corpus=corpus, shortlist=200
    )
    assert reranked.columns == ["q_id", "vec_id", "sim", "rank"]
    got = {(r["q_id"], r["vec_id"]) for r in reranked.collect()}
    prebuilt[1].unpersist()
    adc_recall = len(want & adc_only) / len(want)
    recall = len(want & got) / len(want)
    assert recall >= 0.9, (recall, adc_recall)
    assert recall > adc_recall  # the exact pass must actually help here


def test_ivfpq_nprobe_all_equals_pq(spark):
    """nprobe = n_lists degenerates IVF-PQ to the plain PQ ADC scan: every
    candidate is scored with the same LUTs, so the two operators must
    return identical (q_id, vec_id, adc_dist, rank) sets."""
    from wayproblems_spark.operators.similarity import build_ivfpq_index, ivfpq_topk

    corpus = _clustered(spark, n=600)
    queries = _clustered(spark, n=6).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cb = oracle_codebooks(m=8, k=8, dsub=8)
    pre = build_ivfpq_index(
        corpus, dim=64, m=8, k=8, n_lists=8, iters=3, codebooks=cb
    )
    got = {
        (r["q_id"], r["vec_id"], round(r["adc_dist"], 9), r["rank"])
        for r in ivfpq_topk(pre, queries, k=7, nprobe=8).collect()
    }
    pq_pre = (cb, pre[2].select("vec_id", "codes"))
    want = {
        (r["q_id"], r["vec_id"], round(r["adc_dist"], 9), r["rank"])
        for r in pq_topk(pq_pre, queries, k=7).collect()
    }
    pre[2].unpersist()
    assert got == want and len(want) == 42


def test_ivfpq_rerank_recall_vs_brute(spark):
    """The full composed pipeline (IVF probe → ADC shortlist → exact
    re-rank) on the 16-cluster fixture: nprobe=4 of 32 lists must still
    recover ≥0.9 of the brute-force top-10 (the home cluster maps to few
    lists, and the exact pass restores within-cluster order)."""
    from wayproblems_spark.operators.similarity import build_ivfpq_index, ivfpq_topk

    corpus = _clustered(spark, n=2000)
    queries = _clustered(spark, n=12).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    brute = cosine_topk(corpus, queries, k=10)
    want = {(r["q_id"], r["vec_id"]) for r in brute.collect()}
    pre = build_ivfpq_index(corpus, dim=64, m=8, k=32, n_lists=32, iters=5)
    out = ivfpq_topk(
        pre, queries, k=10, nprobe=4, rerank_corpus=corpus, shortlist=200
    )
    assert out.columns == ["q_id", "vec_id", "sim", "rank"]
    got = {(r["q_id"], r["vec_id"]) for r in out.collect()}
    pre[2].unpersist()
    recall = len(want & got) / len(want)
    assert recall >= 0.9, recall
