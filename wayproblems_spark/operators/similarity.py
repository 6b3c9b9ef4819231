"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — exact brute-force baseline: broadcast the (small) query
  set, dot products via ``zip_with``/``aggregate`` column expressions (JVM),
  deterministic top-k per query via min-struct ordering (sim desc, id asc).
* ``lsh_topk`` — the scale path: random-hyperplane signatures bucket the
  corpus (numpy over Arrow batches, seeded → deterministic), candidates are
  same-bucket rows; exact cosine re-rank inside buckets. Recall is tunable
  with (n_planes, n_tables).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact top-k: (q_id, vec_id, sim, rank). Query side broadcast."""
    j = corpus.crossJoin(F.broadcast(queries))
    sim = cosine_expr(
        F.col(vec_col).cast("array<double>"), F.col(q_vec_col).cast("array<double>")
    )
    scored = j.select(
        F.col(q_id_col), F.col(id_col), sim.alias("sim")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(q_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


_udf_cache: dict = {}


def _hyperplane_sig_udf(dim: int, n_planes: int, seed: int):
    key = ("hp", dim, n_planes, seed)
    if key not in _udf_cache:
        planes = np.random.RandomState(seed).standard_normal((dim, n_planes))

        @pandas_udf("long")
        def _sig(vec: pd.Series) -> pd.Series:
            m = np.stack(vec.to_numpy())
            bits = (m @ planes) > 0
            weights = (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))
            out = (bits.astype(np.uint64) * weights).sum(axis=1)
            return pd.Series(out.view(np.int64))

        _udf_cache[key] = _sig
    return _udf_cache[key]


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Approximate top-k via hyperplane LSH bucket join + exact re-rank."""
    from pyspark.sql.window import Window

    parts = []
    for t in range(n_tables):
        udf = _hyperplane_sig_udf(dim, n_planes, seed=1000 + t)
        c = corpus.select(id_col, vec_col, udf(F.col(vec_col)).alias("sig"))
        q = queries.select(q_id_col, q_vec_col, udf(F.col(q_vec_col)).alias("sig"))
        parts.append(c.join(F.broadcast(q), "sig").drop("sig"))
    cand = parts[0]
    for p in parts[1:]:
        cand = cand.unionByName(p)
    cand = cand.dropDuplicates([q_id_col, id_col])
    sim = cosine_expr(
        F.col(vec_col).cast("array<double>"), F.col(q_vec_col).cast("array<double>")
    )
    scored = cand.select(F.col(q_id_col), F.col(id_col), sim.alias("sim"))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
