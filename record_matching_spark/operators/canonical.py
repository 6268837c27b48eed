"""B16: cluster canonicalization — pick one canonical record per cluster.

Reference analog: canonical-entity selection by completeness ranking then
field aggregation (/root/reference/claude_poc_v2/
vector_enhanced_entity_resolution_v2.py:2086-2206). Spark-first: a window
row_number over (cluster_id) ordered by a completeness score — one shuffle,
no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def canonicalize_clusters(
    clusters: DataFrame,
    records: DataFrame,
    id_col: str = "file_id",
    cluster_col: str = "cluster_id",
    order_by: list[Column] | None = None,
) -> DataFrame:
    """One row per cluster: the member ranked first by `order_by`
    (default: longest content, then lexicographically smallest id —
    the reference's completeness-then-deterministic-tiebreak rule).
    Output: all record columns + cluster_id + cluster_size."""
    joined = clusters.join(records, id_col, "inner")
    order = order_by or [
        F.desc(F.length("content")) if "content" in records.columns else F.desc(id_col),
        F.asc(id_col),
    ]
    w = Window.partitionBy(cluster_col).orderBy(*order)
    size_w = Window.partitionBy(cluster_col)
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .withColumn("cluster_size", F.count("*").over(size_w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
