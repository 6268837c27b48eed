"""A25: engine SQL surface — register tables/stages as temp views and run
SQL strings against them.

Reference analog: /root/reference/record_matching/context.py:110-168 — one
SessionContext registering every stage table plus three SQL views
(templated_vectors, index_vectors, total_ann, context.py:156-166); ad-hoc
SQL record fetches at main.py:301-306,831-836. Spark restatement:
createOrReplaceTempView + spark.sql.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def register_testdata_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TESTDATA_TABLES
) -> list[str]:
    """Register every parquet table under `sf_dir` as a temp view; returns
    the registered names. Scans stay lazy — predicate/column pushdown
    reaches the parquet reader through the view."""
    out = []
    for t in tables:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
        out.append(t)
    return out


def register_pipeline_views(pipeline) -> list[str]:
    """Register each completed pipeline stage checkpoint as a temp view
    (s1_normalized → view `s1_normalized`, …) — the reference's
    stage-tables-in-one-context pattern. Returns registered names."""
    out = []
    for stage in pipeline.STAGES:
        if pipeline._is_done(stage):
            pipeline._read_stage(stage).createOrReplaceTempView(stage)
            out.append(stage)
    return out


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Run a SQL string against the registered views (A25)."""
    return spark.sql(query)
