"""Incremental ingest: exactly-once file pickup across restarts."""

from __future__ import annotations

from pyspark.sql import functions as F

from record_matching_spark.streaming.ingest import incremental_normalize
from record_matching_spark.synth import repo_files, synth_repo_files_with_truth


def test_incremental_normalize_exactly_once(spark, tmp_path):
    src = tmp_path / "incoming"
    dst = tmp_path / "normalized"
    ckp = tmp_path / "ckp"

    batch1 = repo_files(synth_repo_files_with_truth(spark, n_families=10, seed=1))
    batch1.write.parquet(str(src), mode="append")
    n1 = batch1.count()

    incremental_normalize(spark, str(src), str(dst), str(ckp))
    got1 = spark.read.parquet(str(dst))
    assert got1.count() == n1
    assert "content_sha" in got1.columns and "fid" in got1.columns

    # second batch lands; rerun picks up ONLY the new files
    batch2 = repo_files(synth_repo_files_with_truth(spark, n_families=6, seed=2))
    batch2.write.parquet(str(src), mode="append")
    n2 = batch2.count()

    incremental_normalize(spark, str(src), str(dst), str(ckp))
    got2 = spark.read.parquet(str(dst))
    assert got2.count() == n1 + n2                     # no duplicates
    assert got2.select("file_id").distinct().count() == n1 + n2

    # a third run with nothing new appends nothing
    incremental_normalize(spark, str(src), str(dst), str(ckp))
    assert spark.read.parquet(str(dst)).count() == n1 + n2
