from record_matching_spark.sources.io import (  # noqa: F401
    REPO_FILES_SCHEMA,
    read_csv,
    read_repo_files,
    write_csv,
    write_stage,
)
from record_matching_spark.sources.views import (  # noqa: F401
    register_pipeline_views,
    register_testdata_views,
    sql,
)
