"""Deterministic split / quota sampling ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from record_matching_spark.functions.sampling import hash_split, quota_sample


def test_hash_split_deterministic_and_append_stable(spark):
    df = spark.range(0, 5000).select(F.col("id").alias("k"))
    s1 = hash_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              s1.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02
    assert abs(counts["test"] / 5000 - 0.1) < 0.02

    # append-stability: the same keys keep their split inside a bigger table
    df2 = spark.range(0, 10000).select(F.col("id").alias("k"))
    s2 = hash_split(df2, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    moved = (
        s1.withColumnRenamed("split", "a")
        .join(s2.withColumnRenamed("split", "b"), "k")
        .filter(F.col("a") != F.col("b"))
        .count()
    )
    assert moved == 0

    # portable (md5) mode is deterministic too and disjoint-complete
    s3 = hash_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1},
                    portable=True)
    assert s3.count() == 5000
    assert s3.filter(~F.col("split").isin("train", "val", "test")).count() == 0


def test_quota_sample_caps_and_picks_best(spark):
    rows = [("a", i, float(i)) for i in range(10)] + [("b", 100, 1.0)]
    df = spark.createDataFrame(rows, "grp string, id long, score double")
    got = quota_sample(df, ["grp"], cap=3, order_col="score", id_col="id")
    by_grp: dict[str, list] = {}
    for r in got.collect():
        by_grp.setdefault(r["grp"], []).append(r["id"])
    assert sorted(by_grp["a"]) == [7, 8, 9]  # top-3 by score
    assert by_grp["b"] == [100]              # under-cap group intact

    # pure-hash selection (no order col) is deterministic across calls
    g1 = {r["id"] for r in quota_sample(df, ["grp"], 3, id_col="id").collect()}
    g2 = {r["id"] for r in quota_sample(df, ["grp"], 3, id_col="id").collect()}
    assert g1 == g2 and len(g1) == 4
