from record_matching_spark.sources.io import (  # noqa: F401
    REPO_FILES_SCHEMA,
    read_repo_files,
    write_stage,
)
