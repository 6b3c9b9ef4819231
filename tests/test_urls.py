"""URL parse/normalize/registered-domain vs hand-written expectations,
plus domain_stats rollup."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from wayproblems_spark.operators.urls import (
    domain_stats,
    normalize_host,
    parse_url_parts,
    registered_domain,
)

CASES = [
    # url, scheme, host, port, path
    ("https://www.Example.COM/a/b?q=1#f", "https", "www.example.com", None, "/a/b"),
    ("http://news.bbc.co.uk:8080/world", "http", "news.bbc.co.uk", 8080, "/world"),
    ("ftp://files.example.org.", "ftp", "files.example.org.", None, ""),
    ("https://10.1.2.3/x", "https", "10.1.2.3", None, "/x"),
    ("https://localhost:9000", "https", "localhost", 9000, ""),
    ("not a url at all", None, None, None, None),
    ("https://sub.deep.shop.example.com/p", "https", "sub.deep.shop.example.com", None, "/p"),
]

# normalized host -> registered domain
DOMAIN_CASES = [
    ("www.example.com", "example.com"),       # www stripped first by caller
    ("news.bbc.co.uk", "bbc.co.uk"),
    ("files.example.org", "example.org"),
    ("10.1.2.3", "10.1.2.3"),
    ("localhost", "localhost"),
    ("sub.deep.shop.example.com", "example.com"),
    ("co.uk", "co.uk"),                        # bare suffix: n<3 keeps last2
]


def test_parse_url_parts(spark):
    df = spark.createDataFrame([(u,) for u, *_ in CASES], "url string")
    got = df.select(parse_url_parts(F.col("url")).alias("p")).collect()
    for (u, scheme, host, port, path), r in zip(CASES, got):
        p = r["p"]
        assert (p["scheme"], p["host"], p["port"], p["path"]) == (
            scheme, host, port, path
        ), u


def test_normalize_and_registered_domain(spark):
    df = spark.createDataFrame([(h,) for h, _ in DOMAIN_CASES], "h string")
    got = df.select(
        registered_domain(normalize_host(F.col("h"))).alias("d")
    ).collect()
    for (h, want), r in zip(DOMAIN_CASES, got):
        norm_want = want
        assert r["d"] == norm_want, h
    # trailing dot + www both stripped before domain extraction
    one = spark.createDataFrame([("WWW.Shop.Example.COM.",)], "h string")
    assert one.select(
        registered_domain(normalize_host(F.col("h"))).alias("d")
    ).collect()[0]["d"] == "example.com"


def test_domain_stats(spark):
    rows = [
        (0, "https://www.example.com/a", "xxxx"),
        (1, "https://shop.example.com/b", "yyyyyy"),
        (2, "https://news.bbc.co.uk/c", "zz"),
        (3, "bogus", "q"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    got = {r["domain"]: r for r in domain_stats(df).collect()}
    assert got["example.com"]["n_docs"] == 2
    assert got["example.com"]["n_chars"] == 10
    assert got["example.com"]["n_hosts"] == 2  # www.example.com + shop.…
    assert got["bbc.co.uk"]["n_docs"] == 1
    assert got[None]["n_docs"] == 1  # invalid URL rolls up under NULL
