"""B16: cluster canonicalization — pick one canonical record per cluster,
plus field-frequency aggregation across cluster members.

Reference analog: canonical-entity selection by completeness ranking then
field aggregation (/root/reference/claude_poc_v2/
vector_enhanced_entity_resolution_v2.py:2086-2206 — the canonical entity's
fields are each the MOST FREQUENT value across members, not just copied
from one representative row). Spark-first:
- representative row: window row_number over (cluster_id) ordered by a
  completeness score — one shuffle, no per-row Python;
- field frequencies: mode(field, deterministic=true) per cluster — ONE
  hash aggregate (partial map-side combine), ties broken by lowest value
  so output is parallelism-independent.
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


def canonical_fields(
    clusters: DataFrame,
    records: DataFrame,
    fields: list[str],
    id_col: str = "file_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """B16 field-frequency aggregation (reference claude_poc_v2/
    vector_enhanced_entity_resolution_v2.py:2100-2206): for each cluster,
    each requested field's canonical value is the MOST FREQUENT value among
    members (ties → lowest value, so the result is deterministic at any
    parallelism; nulls are ignored per mode() semantics). One hash
    aggregate — partial aggregation combines map-side, no window, no
    per-row Python. Output: (cluster_id, cluster_size, <field>...) with
    each field carrying its majority value.

    Only id_col + fields are taken from `records` BEFORE the join — this
    both trims the shuffle to the requested columns and avoids an
    ambiguous-column AnalysisException when records already carries a
    cluster_id-named column (ADVICE r3)."""
    joined = clusters.select(F.col(id_col), F.col(cluster_col)).join(
        records.select(id_col, *fields), id_col, "inner"
    )
    aggs = [F.count(F.lit(1)).alias("cluster_size")] + [
        F.mode(f, True).alias(f) for f in fields
    ]
    return joined.groupBy(cluster_col).agg(*aggs)
