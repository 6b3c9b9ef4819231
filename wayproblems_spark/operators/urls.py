"""URL parsing, host normalization, and per-domain corpus statistics —
the provenance layer of a web-text pipeline (domain blocklists, per-site
caps, source-mix reporting all key off the registered domain).

Everything is pure JVM column expressions (regexp + array ops on the
split host — zero Python, zero UDFs, scan-stage codegen), and every
regex is restricted to java.util.regex ∩ RE2-identical constructs
(character classes, bounded repetition — no lookaround, no backrefs) so
a SQL oracle replicates the parse byte-for-byte (q47).

Parse contract (deliberately simple and stated, not hidden):

* scheme  — ``^([a-z][a-z0-9+.-]*):...`` lowercased input assumed upstream
  (``parse_url_parts`` lowercases scheme+host itself; paths keep case).
* host    — authority up to the first ``/ : ? #``; normalized by
  stripping a trailing dot and one leading ``www.`` label.
* port    — the digits after ``:`` in the authority, NULL if absent.
* path    — from the first ``/`` after the authority to ``? #`` or end;
  empty authority-only URLs yield ``""``.
* registered_domain — last two host labels, or last THREE when the last
  two form a known second-level public suffix (the short fixed list
  below; the full PSL is a data file, not an algorithm change — swap
  ``_SECOND_LEVEL_SUFFIXES`` for the real list in production). Hosts
  with fewer labels (bare ``localhost``) or IPv4 literals pass through
  unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_URL_RE = r"^([a-z][a-z0-9+.-]*)://([^/:?#]*)(?::([0-9]+))?([^?#]*)"

# Common second-level public suffixes; production swaps in the PSL.
_SECOND_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "co.za", "com.tr", "com.ar",
)

_IPV4_RE = r"^[0-9]{1,3}(\.[0-9]{1,3}){3}$"


def parse_url_parts(url_col) -> Column:
    """struct(scheme, host, port, path) — NULL fields when the component
    is absent; a string with no ``scheme://`` parses to all-NULL (guard
    on ``scheme IS NOT NULL`` for validity)."""
    scheme = F.lower(F.regexp_extract(url_col, _URL_RE, 1))
    host = F.lower(F.regexp_extract(url_col, _URL_RE, 2))
    port = F.regexp_extract(url_col, _URL_RE, 3)
    path = F.regexp_extract(url_col, _URL_RE, 4)
    valid = scheme != ""
    return F.struct(
        F.when(valid, scheme).alias("scheme"),
        F.when(valid, host).alias("host"),
        F.when(valid & (port != ""), port.cast("int")).alias("port"),
        F.when(valid, path).alias("path"),
    )


def normalize_host(host_col) -> Column:
    """Lowercase, strip ONE trailing dot, strip ONE leading ``www.``."""
    h = F.lower(host_col)
    h = F.regexp_replace(h, r"\.$", "")
    return F.regexp_replace(h, r"^www\.", "")


def registered_domain(host_col) -> Column:
    """See module docstring. Input should already be normalized."""
    parts = F.split(host_col, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(
        ".", F.element_at(parts, -2), F.element_at(parts, -1)
    )
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    is_ip = host_col.rlike(_IPV4_RE)
    # concat_ws never returns NULL, so guard NULL hosts explicitly — an
    # unparseable URL must roll up under domain NULL, not "".
    return (
        F.when(host_col.isNull(), F.lit(None).cast("string"))
        .when(is_ip | (n < 2), host_col)
        .when(last2.isin(*_SECOND_LEVEL_SUFFIXES) & (n >= 3), last3)
        .otherwise(last2)
    )


def domain_stats(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per registered domain: document count, char sum, distinct hosts —
    the source-mix report. One parse in the scan stage, one map-side
    partial aggregation; invalid URLs roll up under domain NULL."""
    parts = parse_url_parts(F.col(url_col))
    base = docs.select(
        F.col(id_col),
        registered_domain(normalize_host(parts["host"])).alias("domain"),
        parts["host"].alias("_host"),
        F.length(text_col).alias("_chars"),
    )
    return base.groupBy("domain").agg(
        F.count("*").alias("n_docs"),
        F.sum("_chars").alias("n_chars"),
        F.count_distinct("_host").alias("n_hosts"),
    )
