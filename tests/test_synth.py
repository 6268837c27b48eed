"""Generator invariants: determinism across parallelism, uniqueness, shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from record_matching_spark.synth import (
    entity_truth,
    labeled_pairs,
    repo_files,
    synth_repo_files_with_truth,
)


def test_schema_and_uniqueness(truth_df):
    files = repo_files(truth_df)
    assert files.columns == ["repo", "path", "commit", "lang", "content"]
    n = truth_df.count()
    assert n > 500
    assert truth_df.select("file_id").distinct().count() == n
    assert truth_df.select("repo", "path", "commit").distinct().count() == n


def test_determinism_across_partitioning(spark):
    a = synth_repo_files_with_truth(spark, n_families=30, seed=7, partitions=2)
    b = synth_repo_files_with_truth(spark, n_families=30, seed=7, partitions=13)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_truth_and_pairs(truth_df):
    truth = entity_truth(truth_df)
    assert truth.groupBy("entity_id").count().count() > 100
    lp = labeled_pairs(truth_df)
    row = lp.agg(
        F.sum(F.col("match").cast("long")).alias("pos"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert row["pos"] > 100          # positives exist
    assert row["n"] - row["pos"] > 50  # hard negatives exist
    # canonical order
    assert lp.filter(F.col("left") >= F.col("right")).count() == 0


def test_heavy_tail_cluster_exists(truth_df):
    sizes = truth_df.groupBy("entity_id").count()
    assert sizes.agg(F.max("count")).collect()[0][0] >= 200
