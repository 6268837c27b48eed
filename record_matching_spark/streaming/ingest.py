"""Incremental ingest via Structured Streaming.

The reference is batch-only (SURVEY.md §2: no streaming operators exist);
its resumability comes from stage Parquet directories. This module adds the
Spark-native incremental path a production deployment wants: new repo_files
parquet landing in a directory are picked up exactly-once (file-source +
checkpointLocation), normalized, and appended to the s1 stage table —
so the nightly ER run only re-blocks what changed.

Trigger.availableNow processes the backlog then stops — the batch-friendly
mode that still gets streaming's exactly-once bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from record_matching_spark.operators.normalize import normalize_files
from record_matching_spark.sources.io import REPO_FILES_SCHEMA


def incremental_normalize(
    spark: SparkSession,
    source_dir: str,
    dest_dir: str,
    checkpoint_dir: str,
    await_termination: bool = True,
):
    """Stream repo_files parquet from `source_dir` → normalized stage rows
    appended to `dest_dir`. Re-running after new files land processes ONLY
    the new files (offsets tracked in `checkpoint_dir`). Returns the query.
    """
    stream = (
        spark.readStream.schema(REPO_FILES_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(source_dir)
    )
    normalized = normalize_files(stream)
    q = (
        normalized.writeStream.format("parquet")
        .option("path", dest_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
