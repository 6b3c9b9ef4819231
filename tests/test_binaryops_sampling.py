"""Binary-content ops (magic sniff, byte entropy) + deterministic sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wayproblems_spark.operators.binaryops import (
    byte_stats,
    reference_entropy,
    sniff_format,
)
from wayproblems_spark.operators.sampling import hash_sample, stratified_sample

pytestmark = pytest.mark.usefixtures("spark")


_BLOBS = [
    (0, b"\xff\xd8\xff\xe0junk", "jpeg"),
    (1, b"\x89PNG\r\n\x1a\nrest", "png"),
    (2, b"GIF89a....", "gif"),
    (3, b"RIFF\x10\x00\x00\x00WEBPVP8 ", "webp"),
    (4, b"RIFF\x10\x00\x00\x00WAVEfmt ", "wav"),
    (5, b"RIFF\x10\x00\x00\x00AVI LIST", "riff"),
    (6, b"ID3\x04tag", "mp3"),
    (7, b"OggSpage", "ogg"),
    (8, b"fLaCdata", "flac"),
    (9, b"%PDF-1.7", "pdf"),
    (10, b"PK\x03\x04zip", "zip"),
    (11, b"\x1f\x8b\x08gz", "gzip"),
    (12, b"\x00\x00\x00\x18ftypmp42", "mp4"),
    (13, b"plain text here", "bin"),
    (14, b"\xff", "bin"),  # shorter than every magic
    (15, b"", "bin"),
    (16, None, None),
]


def test_sniff_format_all_magics(spark):
    df = spark.createDataFrame(
        [(i, bytearray(b) if b is not None else None) for i, b, _ in _BLOBS],
        "id long, blob binary",
    )
    got = {
        r["id"]: r["fmt"]
        for r in df.select("id", sniff_format(F.col("blob")).alias("fmt")).collect()
    }
    for i, _, want in _BLOBS:
        assert got[i] == want, (i, got[i], want)


def test_sniff_format_is_codegen(spark):
    """The sniffer must stay JVM-side: no Python eval nodes in the plan."""
    df = spark.createDataFrame([(1, bytearray(b"x"))], "id long, blob binary")
    plan = (
        df.select(sniff_format(F.col("blob")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_byte_stats_entropy_matches_reference(spark):
    payloads = [
        (0, b"\x00" * 100),          # one symbol → 0 bits
        (1, bytes(range(256)) * 4),  # uniform → exactly 8 bits
        (2, b"abab" * 50),           # two symbols → 1 bit
        (3, b"hello world, hello entropy"),
        (4, b""),
        (5, None),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b) if b is not None else None) for i, b in payloads],
        "id long, blob binary",
    )
    got = {r["id"]: r for r in byte_stats(df).collect()}
    for i, b in payloads:
        assert got[i]["entropy"] == pytest.approx(reference_entropy(b), abs=1e-12)
    assert got[1]["entropy"] == pytest.approx(8.0, abs=1e-12)
    assert got[0]["entropy"] == 0.0
    # printable: 'hello world...' all printable; \x00*100 none
    assert got[3]["printable_ratio"] == 1.0
    assert got[0]["printable_ratio"] == 0.0
    assert got[5]["n_bytes"] == 0 and got[5]["format"] is None


def _docs(spark, n=4000):
    langs = ["en", "de", "fr", "zh"]
    return spark.createDataFrame(
        [(i, langs[i % 4]) for i in range(n)], "doc_id long, lang string"
    )


def test_hash_sample_deterministic_and_monotone(spark):
    d = _docs(spark)
    a = {r["doc_id"] for r in hash_sample(d, "doc_id", 0.2, salt="x").collect()}
    b = {r["doc_id"] for r in hash_sample(d, "doc_id", 0.2, salt="x").collect()}
    assert a == b
    # repartition-stable (df.sample is NOT)
    c = {
        r["doc_id"]
        for r in hash_sample(d.repartition(13), "doc_id", 0.2, salt="x").collect()
    }
    assert a == c
    # rate monotone: raising the rate only ADDS rows
    big = {r["doc_id"] for r in hash_sample(d, "doc_id", 0.5, salt="x").collect()}
    assert a <= big
    # roughly the right size (md5 uniformity; 4000 rows, ±5 σ)
    assert abs(len(a) - 800) < 150 and abs(len(big) - 2000) < 200
    # different salt → different set
    other = {r["doc_id"] for r in hash_sample(d, "doc_id", 0.2, salt="y").collect()}
    assert a != other


def test_stratified_sample_rates_and_independence(spark):
    d = _docs(spark)
    rates = {"en": 0.1, "de": 0.9}
    kept = stratified_sample(d, "doc_id", "lang", rates, default_rate=1.0).collect()
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    assert abs(len(by_lang["en"]) - 100) < 60
    assert abs(len(by_lang["de"]) - 900) < 60
    # default_rate strata kept whole
    assert len(by_lang["fr"]) == 1000 and len(by_lang["zh"]) == 1000
    # changing ANOTHER stratum's rate must not move this stratum's set
    kept2 = stratified_sample(
        d, "doc_id", "lang", {"en": 0.1, "de": 0.2}, default_rate=1.0
    ).collect()
    en2 = {r["doc_id"] for r in kept2 if r["lang"] == "en"}
    assert en2 == by_lang["en"]


def test_sample_plan_is_pure_filter(spark):
    """No shuffle, no Python: the sample must be a codegen filter on the scan."""
    d = _docs(spark)
    plan = (
        stratified_sample(d, "doc_id", "lang", {"en": 0.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("Exchange", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, bad
