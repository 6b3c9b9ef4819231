"""Connected components over a pair/edge frame — the clustering step that
turns near-duplicate PAIRS (minhash_lsh / simhash / embedding-ANN output)
into duplicate GROUPS with one canonical keeper per group.

Algorithm: hash-min label propagation. Every vertex starts labeled with
its own id; each round a vertex takes the min of its own label and its
neighbors' labels (one equi-join + one min-aggregate — two shuffles on
uniform vertex-id keys, map-side partial min). The smallest id of a
component reaches every member in ≤ eccentricity(min-vertex) rounds, so
iterations ≈ cluster diameter — for near-dup clusters (dense, star-like)
that is 2–4; convergence is detected with a 1-row changed-count probe.
For adversarially long chains the large-star/small-star contraction
(Kiveris et al., "Connected Components in MapReduce") halves rounds to
O(log d); the propagation form is kept for its simpler, fully codegen
inner loop — `max_iter` bounds the worst case explicitly.

Scale notes: labels/edges shuffle on vertex ids (uniform); each round the
label frame is ``localCheckpoint``-ed — iterative frames MUST truncate
lineage, or the logical plan doubles per round (the classic iterative-
Spark failure: planning itself OOMs long before the data does). The
symmetric edge list is persisted once. Nothing is collected — the driver
sees only the per-round 1-row convergence probe. On a real cluster with
executor churn, swap localCheckpoint for reliable ``checkpoint`` with a
checkpoint dir (same pattern as knn's ``materialize_dir``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """edges(a, b) → (id, component_id) for every vertex appearing in any
    edge; component_id = the MIN vertex id of the component
    (deterministic, partition-order independent).

    Raises RuntimeError if the loop exits at ``max_iter`` without the
    convergence probe seeing zero changes — hash-min needs ~diameter
    rounds, so a chain longer than ``max_iter`` would otherwise return
    partially-propagated (wrong) labels silently (ADVICE r3)."""
    sym = edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    sym = (
        sym.unionByName(
            sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("src").alias("v"))
        .distinct()
        .withColumn("label", F.col("v"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        neigh = sym.join(
            labels.withColumnRenamed("v", "dst"), "dst"
        ).select(F.col("src").alias("v"), "label")
        new_labels = (
            neigh.unionByName(labels.select("v", "label"))
            .groupBy("v")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.withColumnRenamed("label", "nl")
            .join(labels, "v")
            .filter(F.col("nl") != F.col("label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in max_iter={max_iter} "
            "rounds (component diameter exceeds the iteration bound); "
            "returning the partial labels would silently split components — "
            "raise max_iter"
        )
    return labels.select(F.col("v").alias("id"), F.col("label").alias("component_id"))


def _group_labels(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    a_col: str,
    b_col: str,
    max_iter: int,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id_col, *extra_cols, _gid): every doc labeled with its component's
    min id; docs in no pair label themselves. Shared helper of
    near_dup_groups and canonical_docs (each runs components once over
    its own pair frame)."""
    comp = connected_components(pairs, a_col, b_col, max_iter)
    return (
        docs.select(F.col(id_col), *[F.col(c) for c in extra_cols])
        .join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            F.col(id_col),
            *[F.col(c) for c in extra_cols],
            F.coalesce("component_id", F.col(id_col)).alias("_gid"),
        )
    )


def near_dup_groups(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """(doc_id, keeper_id): documents connected through near-dup pairs
    share the min-id keeper; documents in no pair keep themselves. The
    standard dedup decision step after minhash_lsh/simhash/ANN pairs."""
    return _group_labels(docs, pairs, id_col, a_col, b_col, max_iter).select(
        F.col(id_col), F.col("_gid").alias("keeper_id")
    )


def canonical_docs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "quality",
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """The full corpus-dedup KEEP decision: per near-dup group, keep the
    max-``quality_col`` document (ties → min id); singletons keep
    themselves. Returns (id_col, keeper_id, kept).

    This is what a training pipeline actually ships — ``near_dup_groups``
    labels groups with the min ID, but the canonical representative should
    be the BEST document (longest, cleanest, highest quality score), not
    the one with the smallest key.

    Scale shape: components as in :func:`connected_components`; the
    argmax is one (group_id) hash aggregate of a (quality, -id) struct max
    — map-side partial, no window over the corpus — then a broadcast-sized
    join back (one row per GROUP, ≪ docs)."""
    labeled = _group_labels(
        docs, pairs, id_col, a_col, b_col, max_iter, extra_cols=(quality_col,)
    )
    best = labeled.groupBy("_gid").agg(
        F.max(
            F.struct(
                F.col(quality_col).alias("q"),
                (-F.col(id_col).cast("long")).alias("nid"),
            )
        ).alias("_m")
    )
    keepers = best.select("_gid", (-F.col("_m.nid")).alias("keeper_id"))
    return (
        labeled.join(keepers, "_gid")
        .select(
            F.col(id_col),
            F.col("keeper_id"),
            (F.col(id_col) == F.col("keeper_id")).alias("kept"),
        )
    )
