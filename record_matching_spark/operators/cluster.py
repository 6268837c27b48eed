"""Stage S8: transitive closure via large-star / small-star connected
components on DataFrames.

Replaces the reference's driver-side scipy DisjointSet over streamed batches
(/root/reference/record_matching/main.py:629-651) and networkx
connected_components (/root/reference/claude_poc_v2/
vector_enhanced_entity_resolution_v2.py:1929-1960) — neither distributes.

Algorithm: Kiveris et al., "Connected Components in MapReduce and Beyond"
(SoCC 2014) — alternate:
  large-star(u): attach every neighbor v > u to m = min(N(u) ∪ {u})
  small-star(u): attach every neighbor v ≤ u (and u) to that minimum
until the edge set reaches a fixpoint; converges in O(log n) rounds and
leaves a star forest where every node points at its component minimum.

Each iteration is two shuffles (groupBy min + join); lineage is truncated
with localCheckpoint every round (iterative self-joins otherwise double the
plan each iteration — SURVEY.md §7.4 risk 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Undirected edge set, canonical src > dst (pointing at smaller), no
    self loops, distinct."""
    return (
        edges.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _symmetrize(e: DataFrame) -> DataFrame:
    return e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def _large_star(e: DataFrame) -> DataFrame:
    nbrs = _symmetrize(e)
    mins = nbrs.groupBy("src").agg(F.min("dst").alias("mn"))
    mins = mins.select("src", F.least("mn", "src").alias("m"))
    return (
        nbrs.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    # canonical src > dst: N⁻(src) = all dst. m = min over smaller nbrs (≤ src by construction)
    mins = e.groupBy("src").agg(F.min("dst").alias("m"))
    attach_nbrs = (
        e.join(mins, "src")
        .filter(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    attach_center = mins.select("src", F.col("m").alias("dst"))
    return _canon(attach_nbrs.unionByName(attach_center))


def _fingerprint(e: DataFrame) -> tuple[int, int, int]:
    row = e.agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h1"),
        F.sum(F.xxhash64("dst", "src", F.lit("s2")).cast("decimal(38,0)")).alias("h2"),
    ).collect()[0]
    return (row["n"], str(row["h1"]), str(row["h2"]))


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 40,
) -> DataFrame:
    """Edges (any orientation, any dtype with a total order) → assignments
    DataFrame(node, component) where component = min node id of the
    component. Nodes that appear in no edge are absent (caller unions
    singletons). Deterministic: output depends only on the edge set."""
    e = _canon(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")))
    e = e.localCheckpoint(eager=True)
    prev_fp = None
    for _ in range(max_iter):
        e = _large_star(e)
        e = _small_star(e)
        e = e.localCheckpoint(eager=True)
        fp = _fingerprint(e)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    # star forest: every src points at its component min (dst); add roots
    members = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = e.select(F.col("dst").alias("node"), F.col("dst").alias("component")).distinct()
    return members.unionByName(roots).distinct()


def cluster_assignments(
    edges: DataFrame,
    all_nodes: DataFrame,
    node_col: str,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """connected_components + singleton completion: every node in
    `all_nodes` gets a cluster_id (its own id if isolated).

    Output schema: (<node_col>, cluster_id) — the reference's CLUSTERS
    table shape (/root/reference/record_matching/context.py:95-100)."""
    cc = connected_components(edges, src=src, dst=dst)
    nodes = all_nodes.select(F.col(node_col)).distinct()
    return nodes.join(
        cc.withColumnRenamed("node", node_col), node_col, "left"
    ).select(
        node_col,
        F.coalesce("component", F.col(node_col)).alias("cluster_id"),
    )
