"""pages → (text, ways, nodes, polys): byte-identical extraction (G1) and
vectorized geoparse (G2).

* ``extract_text`` is the only Python-touching stage, an Arrow-batched
  pandas UDF (never row-at-a-time Python at the Spark level; inside the
  batch only vectorized pandas str ops are used). It inverts
  ``fixtures.pages.html_wrap`` exactly — the BASELINE.json row invariant is
  byte-identical text per url, verified by ``verify_extraction``.
* The geoparse (``ways_from_pages`` etc.) is pure JVM: ``regexp_extract_all``
  over the text column + ``str_to_map``/``split`` field parsing — it runs
  inside whole-stage codegen, shuffles nothing, and scales linearly with
  input splits.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_ARTICLE_RE = r'<article id="main">(.*?)</article>'


def _extract_batch(html: pd.Series) -> pd.Series:
    s = html.str.decode("utf-8")  # vectorized bytes→str
    body = s.str.extract(_ARTICLE_RE, flags=re.DOTALL, expand=False)
    # inverse of fixtures.pages._escape — order matters (&amp; last).
    body = body.str.replace("&lt;", "<", regex=False)
    body = body.str.replace("&gt;", ">", regex=False)
    body = body.str.replace("&amp;", "&", regex=False)
    return body


_udf_cache: dict = {}


def _extract_text_udf():
    # pandas_udf return-type parsing needs an active session → build lazily.
    if "extract" not in _udf_cache:
        _udf_cache["extract"] = pandas_udf("string")(_extract_batch)
    return _udf_cache["extract"]


def extract_text(pages: DataFrame) -> DataFrame:
    """html:binary → extracted:string (G1)."""
    return pages.withColumn("extracted", _extract_text_udf()(F.col("html")))


def verify_extraction(pages: DataFrame) -> int:
    """Number of urls whose extracted text is NOT byte-identical to `text`."""
    df = extract_text(pages)
    return df.filter(
        ~F.col("extracted").eqNullSafe(F.col("text"))
    ).count()


def _lines(pages: DataFrame, prefix: str) -> DataFrame:
    pat = f"(?m)^{prefix} .*$"
    return pages.select(
        "url",
        F.explode(F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0))).alias("line"),
    )


def ways_from_pages(pages: DataFrame) -> DataFrame:
    """Recover the way table (FIXTURES.md §2 schema) — pure JVM regex."""
    ln = _lines(pages, "OSMWAY")
    tagstr = F.regexp_extract("line", r" tags=(.*)$", 1)
    return ln.select(
        F.regexp_extract("line", r" id=(\d+)", 1).try_cast("long").alias("way_id"),
        F.regexp_extract("line", r" version=(\d+)", 1).try_cast("int").alias("version"),
        F.regexp_extract("line", r" changeset=(\d+)", 1).try_cast("long").alias("changeset"),
        F.regexp_extract("line", r" uid=(\d+)", 1).try_cast("long").alias("uid"),
        F.regexp_extract("line", r" user=(\S+)", 1).alias("user"),
        F.to_timestamp(
            F.regexp_extract("line", r" ts=(\S+)", 1), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ).alias("ts"),
        F.transform(
            F.split(F.regexp_extract("line", r" nodes=(\S*)", 1), ","),
            lambda x: x.try_cast("long"),
        ).alias("nodes"),
        F.when(tagstr == "", F.create_map().cast("map<string,string>"))
        .otherwise(F.str_to_map(tagstr, F.lit("\t"), F.lit("="))).alias("tags"),
        F.col("url").alias("src_url"),
    )


def nodes_from_pages(pages: DataFrame) -> DataFrame:
    ln = _lines(pages, "OSMNODE")
    return ln.select(
        F.regexp_extract("line", r" id=(\d+)", 1).try_cast("long").alias("node_id"),
        F.regexp_extract("line", r" lat=(-?[\d.]+)", 1).try_cast("double").alias("lat"),
        F.regexp_extract("line", r" lon=(-?[\d.]+)", 1).try_cast("double").alias("lon"),
    )


def polys_from_pages(pages: DataFrame) -> DataFrame:
    """Polygon layer: poly_id, kind, ring array<struct<lon,lat>> (closed)."""
    ln = _lines(pages, "OSMPOLY")
    ring = F.transform(
        F.split(F.regexp_extract("line", r" ring=(.*)$", 1), ","),
        lambda p: F.struct(
            F.split(p, " ").getItem(0).try_cast("double").alias("lon"),
            F.split(p, " ").getItem(1).try_cast("double").alias("lat"),
        ),
    )
    return ln.select(
        F.regexp_extract("line", r" id=(\d+)", 1).try_cast("long").alias("poly_id"),
        F.regexp_extract("line", r" kind=(\S+)", 1).alias("kind"),
        ring.alias("ring"),
    )


def write_pages_table(pages: DataFrame, path: str) -> None:
    """Production pages-table layout (the input_hint's Iceberg-style table,
    expressed as Hive-partitioned parquet since no Iceberg catalog jars
    ship in this environment — the layout carries the same pruning
    semantics): partitioned by crawl date (`warc_date=YYYY-MM-DD`), so
    date-range queries prune whole directories at planning time and a
    1000-executor scan of one crawl day never touches the other ~thousand
    days of a 100 TB corpus."""
    (
        pages.withColumn("warc_date", F.to_date("warc_ts"))
        .repartition("warc_date")
        .write.mode("overwrite")
        .partitionBy("warc_date")
        .parquet(path)
    )


def read_pages_table(pages_path: str, spark=None, since=None, until=None) -> DataFrame:
    """Read the partitioned pages table with optional date-range pruning
    (filters land in the scan's PartitionFilters — plan-asserted in
    tests/test_plans.py)."""
    from pyspark.sql import SparkSession

    spark = spark or SparkSession.getActiveSession()
    df = spark.read.parquet(pages_path)
    if since is not None:
        df = df.filter(F.col("warc_date") >= F.lit(since))
    if until is not None:
        df = df.filter(F.col("warc_date") < F.lit(until))
    return df
