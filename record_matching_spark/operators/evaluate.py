"""Stage S9: evaluation — pairwise precision/recall/F1 and Adjusted Rand
Index, all as distributed DataFrame ops.

Reference analogs:
- pairwise recall/precision via cluster-expansion self-join + inner/anti
  joins (/root/reference/record_matching/main.py:697-795).
- ARI via sklearn on driver (/root/reference/record_matching/main.py:715-728)
  → pair-counting ARI from the cluster×truth contingency aggregate (no
  sklearn; scales to arbitrarily many rows because only per-cluster counts
  are aggregated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clusters_to_pairs(clusters: DataFrame, element_col: str = "file_id",
                      cluster_col: str = "cluster_id") -> DataFrame:
    """Expand cluster assignments into all within-cluster pairs (left<right).
    Reference: calculate_expanded_match (main.py:697-712)."""
    a = clusters.select(
        F.col(cluster_col).alias("_c"), F.col(element_col).alias("left")
    )
    b = clusters.select(
        F.col(cluster_col).alias("_c"), F.col(element_col).alias("right")
    )
    return a.join(b, "_c").filter(F.col("left") < F.col("right")).select("left", "right")


def pairwise_metrics(pred_pairs: DataFrame, true_pairs: DataFrame) -> dict[str, float]:
    """precision/recall/F1 over canonicalized (left<right) pair sets.
    TP via inner join, FP/FN via anti joins (reference main.py:771-795)."""
    p = pred_pairs.select("left", "right").distinct()
    t = true_pairs.select("left", "right").distinct()
    tp = p.join(t, ["left", "right"], "inner").count()
    fp = p.join(t, ["left", "right"], "left_anti").count()
    fn = t.join(p, ["left", "right"], "left_anti").count()
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": prec, "recall": rec, "f1": f1}


def labeled_pair_metrics(scored: DataFrame, labeled: DataFrame, tau: float) -> dict[str, float]:
    """F1 on labeled pairs: prediction = score > tau, restricted to pairs
    present in the labeled set (the acceptance gate: BASELINE.json metric)."""
    j = labeled.join(scored.select("left", "right", "score"), ["left", "right"], "left")
    j = j.withColumn("pred", F.coalesce(F.col("score") > tau, F.lit(False)))
    agg = j.agg(
        F.sum((F.col("pred") & F.col("match")).cast("long")).alias("tp"),
        F.sum((F.col("pred") & ~F.col("match")).cast("long")).alias("fp"),
        F.sum((~F.col("pred") & F.col("match")).cast("long")).alias("fn"),
    ).collect()[0]
    tp, fp, fn = agg["tp"] or 0, agg["fp"] or 0, agg["fn"] or 0
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": prec, "recall": rec, "f1": f1}


def adjusted_rand_index(
    pred: DataFrame, truth: DataFrame, element_col: str = "file_id",
    pred_col: str = "cluster_id", truth_col: str = "entity_id",
) -> float:
    """Pair-counting ARI from the contingency table — fully distributed.

    ARI = (Σ_ij C(n_ij,2) - Σ_i C(a_i,2) Σ_j C(b_j,2)/C(n,2))
          / (½[Σ_i C(a_i,2)+Σ_j C(b_j,2)] - Σ_i C(a_i,2) Σ_j C(b_j,2)/C(n,2))
    """
    def comb2(col):
        return col * (col - 1) / 2.0

    j = pred.select(element_col, pred_col).join(
        truth.select(element_col, truth_col), element_col, "inner"
    )
    n = j.count()
    if n < 2:
        return 1.0
    sum_nij = (
        j.groupBy(pred_col, truth_col).count()
        .agg(F.sum(comb2(F.col("count"))).alias("s")).collect()[0]["s"] or 0.0
    )
    sum_ai = (
        j.groupBy(pred_col).count()
        .agg(F.sum(comb2(F.col("count"))).alias("s")).collect()[0]["s"] or 0.0
    )
    sum_bj = (
        j.groupBy(truth_col).count()
        .agg(F.sum(comb2(F.col("count"))).alias("s")).collect()[0]["s"] or 0.0
    )
    cn2 = n * (n - 1) / 2.0
    expected = sum_ai * sum_bj / cn2
    max_index = (sum_ai + sum_bj) / 2.0
    if max_index == expected:
        return 1.0
    return (sum_nij - expected) / (max_index - expected)
