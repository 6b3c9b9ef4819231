"""End-to-end corpus-curation job (jobs/curate_corpus.py): the webtext
operators composed — quality gate → stratified sample → minhash dedup →
max-quality keep decision → vocabulary."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))

pytestmark = pytest.mark.usefixtures("spark")

_STOP = "the and of to in is that for with it"  # 10 stopword tokens


def _corpus(spark):
    """72 docs: 20 triplet groups — base (15 tokens), an exact dup, and a
    17-token variant (word-shingle J = 11/13 ≈ 0.846 ≥ 0.8) whose extra
    length gives it the strictly highest quality score (len_ok 0.85 vs
    0.75 → quality 0.955 vs 0.925) — plus 12 junk docs the quality gate
    drops (single short token, no stopwords → quality ≈ 0.42 < 0.5)."""
    rows = []
    for g in range(20):
        base = _STOP + " " + " ".join(f"w{g}t{i}" for i in range(5))
        rows.append((3 * g, base, "en"))
        rows.append((3 * g + 1, base, "en"))          # exact dup (J = 1)
        rows.append((3 * g + 2, base + " extra tail", "de"))  # best quality
    for j in range(12):
        rows.append((1000 + j, "xxx", "zh"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_curate_funnel_and_decisions(spark, tmp_path):
    from curate_corpus import curate

    docs = _corpus(spark)
    curated, decisions, vocab, stats, (staged, tp) = curate(
        spark, docs, min_quality=0.5, jaccard=0.8, vocab_k=50
    )
    dec = decisions.collect()
    cur = {r["doc_id"] for r in curated.select("doc_id").collect()}
    voc = vocab.collect()
    for fr in tp:
        fr.unpersist()
    staged.unpersist()

    # funnel: junk dropped by quality, nothing dropped by sampling (rate 1)
    assert stats["input"] == 72
    assert stats["after_quality"] == 60
    assert stats["after_sampling"] == 60
    # dedup decision: exactly one kept per group
    by_keeper: dict[int, list] = {}
    for r in dec:
        by_keeper.setdefault(r["keeper_id"], []).append(r)
    assert sum(1 for r in dec if r["kept"]) == len(by_keeper)
    # every triplet collapses to one group whose keeper is the strictly
    # highest-quality member (the 17-token residue-2 doc)
    triplets = [ms for ms in by_keeper.values() if len(ms) == 3]
    assert len(triplets) == 20
    for ms in triplets:
        keeper = next(m["doc_id"] for m in ms if m["kept"])
        assert keeper % 3 == 2
    # curated == kept decisions
    assert cur == {r["doc_id"] for r in dec if r["kept"]}
    # vocab over the 20 kept docs: "the" appears once per keeper
    top_terms = {r["term"]: r["n"] for r in voc}
    assert top_terms["the"] == 20


def test_curate_cli_smoke(spark, tmp_path):
    from curate_corpus import main

    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "out")
    _corpus(spark).write.parquet(docs_dir)
    rc = main(
        [
            "--docs", docs_dir, "--out", out_dir,
            "--min-quality", "0.5", "--lang-rates", "zh=1.0",
            "--vocab-k", "25",
        ]
    )
    assert rc == 0
    stats = json.load(open(os.path.join(out_dir, "stats.json")))
    assert stats["curated"] < stats["after_sampling"] <= stats["input"]
    assert spark.read.parquet(os.path.join(out_dir, "vocab")).count() == 25
    kept = spark.read.parquet(os.path.join(out_dir, "curated"))
    assert kept.count() == stats["curated"]
    assert "quality" in kept.columns


def test_curate_all_stages(spark, tmp_path):
    """Full composition: redact + repetition + source cap + decontam on.
    The planted structure makes each optional stage's effect observable
    and deterministic."""
    from pyspark.sql import functions as F

    from curate_corpus import curate

    base = _corpus(spark).withColumn(
        "source", F.concat(F.lit("s"), (F.col("doc_id") % 2).cast("string"))
    )
    # plant a PII doc (passes quality after scrub) and a repetitious doc
    extra = spark.createDataFrame(
        [
            (2000, _STOP + " mail me at bob@x.org now ok", "en", "s0"),
            (2001, _STOP + " spam spam spam spam spam spam spam spam spam "
                   "spam spam spam spam spam spam spam spam spam", "en", "s0"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    docs = base.union(extra)
    # benchmark = group 0's SPECIFIC token run (not the shared stopword
    # prefix, which would contaminate every doc in the fixture)
    bench = spark.createDataFrame(
        [("w0t0 w0t1 w0t2 w0t3 w0t4",)], "text string"
    )

    curated, decisions, vocab, stats, (staged, tp) = curate(
        spark, docs, min_quality=0.5, jaccard=0.8, vocab_k=50,
        redact=True, repetition=True, source_cap=100,
        benchmark=bench, decontam_n=5,
    )
    cur = {r["doc_id"] for r in curated.select("doc_id").collect()}
    scrubbed = curated.filter(F.col("doc_id") == 2000).collect()
    for fr in tp:
        fr.unpersist()
    staged.unpersist()

    # repetition filter killed the spam doc before sampling
    assert stats["after_repetition"] < stats["after_quality"]
    assert 2001 not in cur
    # decontam removed group 0 (docs 0, 1 contain the benchmark 5-gram
    # verbatim; doc 2 extends the text but keeps the gram)
    assert stats["after_filters"] < stats["after_repetition"]
    assert cur.isdisjoint({0, 1, 2})
    # the PII doc survived with its email scrubbed
    assert scrubbed and "<EMAIL>" in scrubbed[0]["text"]
    assert "bob@x.org" not in scrubbed[0]["text"]
    # source cap at 100 is a no-op here; every stage count is recorded
    assert stats["after_cap"] == stats["after_repetition"]


def test_cap_per_key_determinism(spark):
    from pyspark.sql import functions as F

    from wayproblems_spark.operators.sampling import cap_per_key

    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(90)], "doc_id long, g string"
    )
    once = sorted(r["doc_id"] for r in cap_per_key(df, ["g"], 7).collect())
    # deterministic across repartitionings
    again = sorted(
        r["doc_id"]
        for r in cap_per_key(df.repartition(13), ["g"], 7).collect()
    )
    assert once == again and len(once) == 21
    # every group capped at exactly 7
    per_g = (
        cap_per_key(df, ["g"], 7).groupBy("g").count().collect()
    )
    assert {r["count"] for r in per_g} == {7}
    # append-stability: adding rows never evicts a survivor's RANK order
    # prefix — the hash draw is a pure row function, so the first-7 set
    # can only change if a new row hashes into the prefix
    bigger = df.union(
        spark.createDataFrame([(1000, "g0")], "doc_id long, g string")
    )
    b = sorted(r["doc_id"] for r in cap_per_key(bigger, ["g"], 7).collect())
    assert len(b) == 21


def test_curate_closing_stages(spark, tmp_path):
    """Round-6 closing stages: LM perplexity cut -> source mixture ->
    frozen training-order shuffle. The ppl cut is derived from the
    operator itself (midpoint between a planted OOV-heavy doc and the
    in-domain docs), so the test is deterministic without pinning
    floats."""
    from pyspark.sql import functions as F

    from curate_corpus import curate
    from wayproblems_spark.operators.lm import perplexity, train_unigram_lm

    base = _corpus(spark).withColumn(
        "source", F.concat(F.lit("s"), (F.col("doc_id") % 2).cast("string"))
    )
    # passes the quality gate (stopword prefix, decent length) but is
    # OOV-heavy vs the reference slice -> high perplexity
    oov = spark.createDataFrame(
        [(3000, _STOP + " qqq zzz vvv kkk jjj uuu nnn mmm ppp rrr sss ttt",
          "en", "s0")],
        "doc_id long, text string, lang string, source string",
    )
    docs = base.union(oov)
    lm_ref = base.filter(F.col("doc_id") % 3 == 0).select("doc_id", "text")

    lm, lm_stats = train_unigram_lm(lm_ref)
    ppl = {
        r["doc_id"]: r["ppl"]
        for r in perplexity(
            docs.select("doc_id", "text"), lm, lm_stats
        ).collect()
    }
    # cut between the WORST legit doc (the variants carry 2 OOV tokens
    # each) and the planted mostly-OOV doc
    worst_legit = max(p for d, p in ppl.items() if d < 1000 and p)
    cut = (worst_legit + ppl[3000]) / 2
    assert worst_legit < cut < ppl[3000]

    curated, decisions, vocab, stats, (staged, tp) = curate(
        spark, docs, min_quality=0.5, jaccard=0.8, vocab_k=50,
        lm_ref=lm_ref, max_ppl=cut,
        mix_weights={"s0": 0.5, "s1": 0.5}, mix_epochs=2.0,
        shuffle=True,
    )
    rows = curated.collect()
    for fr in tp:
        fr.unpersist()
    staged.unpersist()

    # the OOV doc died at the ppl stage (it would otherwise survive:
    # unique tokens, no near-dups)
    assert stats["after_ppl"] == stats["after_quality"] - 1
    ids = {r["doc_id"] for r in rows}
    assert 3000 not in ids
    # mixture: epoch column present, (doc_id, epoch) unique, stats carry
    # rates; shuffle: ranks are an exact 0..n-1 permutation
    keys = [(r["doc_id"], r["epoch"]) for r in rows]
    assert len(keys) == len(set(keys))
    assert set(stats["mix"]) == {"s0", "s1"}
    assert stats["mix_target_tokens"] > 0
    ranks = sorted(r["shuffle_rank"] for r in rows)
    assert ranks == list(range(len(rows)))
    assert "sample_id" in curated.columns


def test_curate_strip_substrings(spark):
    """Opt-in stage 0b: the shared 8-token boilerplate tail is stripped
    from exactly the docs that carry it, before quality is scored; other
    docs' text is byte-identical (no-span docs pass through untouched)."""
    from curate_corpus import curate

    tail = "visit our partner network for more great content"  # 8 tokens
    bodies = [
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet",
        "kilo lima mike november oscar papa quebec romeo sierra tango",
        "uniform victor whiskey xray yankee zulu one two three four",
        "five six seven eight nine ten eleven twelve thirteen fourteen",
    ]
    docs = spark.createDataFrame(
        [
            (0, bodies[0] + " " + tail, "en"),
            (1, bodies[1] + " " + tail, "en"),
            (2, bodies[2], "en"),
            (3, bodies[3], "en"),
        ],
        "doc_id long, text string, lang string",
    )
    curated, decisions, vocab, stats, (staged, tp) = curate(
        spark, docs, min_quality=0.0, jaccard=0.8, vocab_k=50,
        strip_substrings=8,
    )
    texts = {r["doc_id"]: r["text"] for r in curated.select("doc_id", "text").collect()}
    for fr in tp:
        fr.unpersist()
    staged.unpersist()

    # one span per tailed doc, none elsewhere
    assert stats["substring_spans"] == 2
    assert stats["after_quality"] == 4
    # tailed docs lost exactly the tail; others byte-identical
    assert texts[0] == bodies[0]
    assert texts[1] == bodies[1]
    assert texts[2] == bodies[2]
    assert texts[3] == bodies[3]
