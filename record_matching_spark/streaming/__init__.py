from record_matching_spark.streaming.ingest import incremental_normalize  # noqa: F401
