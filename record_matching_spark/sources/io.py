"""Sources & sinks for the engine's tables.

Reference analogs: CSV/Parquet scans with explicit pyarrow schemas
(/root/reference/record_matching/context.py:110-154) and per-stage Parquet
sinks (/root/reference/record_matching/main.py:136,158,190,...).

Spark-first: explicit StructType enforced on read (never inferred for the
contract table), Iceberg catalog tables when the runtime has the Iceberg
extensions (gated — this sandbox has plain Parquet only), partitioned
writes for stage outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# the BASELINE.json.input_hint contract schema
REPO_FILES_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
    ]
)


def _has_iceberg(spark: SparkSession) -> bool:
    try:
        exts = spark.conf.get("spark.sql.extensions") or ""
    except Exception:
        return False
    return "IcebergSparkSessionExtensions" in exts


def read_repo_files(
    spark: SparkSession,
    source: str,
    fmt: str = "parquet",
) -> DataFrame:
    """Read the repo_files input table.

    `source` is an Iceberg table name (catalog.db.table) when the session
    has Iceberg extensions and fmt='iceberg'; otherwise a path read with the
    contract schema enforced (parquet/csv). Enforced schema means a
    malformed table fails AT READ, not three stages later.
    """
    if fmt == "iceberg":
        if not _has_iceberg(spark):
            raise RuntimeError(
                "fmt='iceberg' requires Iceberg Spark extensions on the cluster; "
                "this runtime has none — use fmt='parquet'"
            )
        return spark.table(source)
    if fmt == "csv":
        return spark.read.schema(REPO_FILES_SCHEMA).option("header", "true").csv(source)
    return spark.read.schema(REPO_FILES_SCHEMA).parquet(source)


def iceberg_ddl(
    table: str = "catalog.db.repo_files",
    partition_by: tuple[str, ...] = ("lang", "bucket(64, repo)"),
) -> str:
    """DDL for the repo_files contract table as an Iceberg table — the
    deployment recipe for clusters with Iceberg extensions (this sandbox
    has none, so it is emitted as a string rather than executed; run it
    via spark.sql on a real cluster).

    Partition spec rationale at 100 TB: `lang` gives coarse static pruning
    for per-language jobs; `bucket(64, repo)` spreads the heavy-repo skew
    while keeping one repo's files co-located for repo-scoped scans.
    Reference analog: hive partitioning of the templated stage by `key`
    (/root/reference/record_matching/context.py:118-123)."""
    cols = ", ".join(f"{f.name} STRING" for f in REPO_FILES_SCHEMA.fields)
    spec = ", ".join(partition_by)
    return (
        f"CREATE TABLE IF NOT EXISTS {table} ({cols}) USING iceberg "
        f"PARTITIONED BY ({spec}) "
        f"TBLPROPERTIES ('write.distribution-mode'='hash', "
        f"'write.target-file-size-bytes'='536870912')"
    )


def create_catalog_table(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    partition_by: tuple[str, ...] = (),
    fmt: str | None = None,
) -> DataFrame:
    """EXECUTED catalog-table registration (reference table registration,
    /root/reference/record_matching/context.py:110-168): write `df` as a
    managed, optionally partitioned table through the DataFrameWriterV2
    API and return the catalog read-back.

    This is the exact call an Iceberg deployment uses — `writeTo(t)
    .using('iceberg')` against an Iceberg catalog gives hidden-partition
    tables with snapshots/time-travel (DDL recipe in `iceberg_ddl`). The
    sandbox has no Iceberg runtime jar and no network to fetch one
    (ROADMAP.md documents the attempt), so fmt defaults to the session
    catalog's parquet V2 path — the same code path, the same partition
    pruning on read, minus snapshot metadata. test_round4 executes this;
    test_iceberg_round_trip upgrades to the real thing when the jar is
    present."""
    from pyspark.sql import functions as F

    fmt = fmt or ("iceberg" if _has_iceberg(spark) else "parquet")
    writer = df.writeTo(table).using(fmt)
    if partition_by:
        cols = [F.col(c) for c in partition_by]
        writer = writer.partitionedBy(cols[0], *cols[1:])
    if fmt == "iceberg":
        # Iceberg's catalog supports atomic REPLACE TABLE AS SELECT
        writer.createOrReplace()
    else:
        # V2SessionCatalog has no RTAS: emulate replace as drop + CTAS
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        writer.create()
    return spark.table(table)


def read_csv(
    spark: SparkSession, path: str, schema: str | T.StructType
) -> DataFrame:
    """A1: CSV scan with an enforced schema (never inferred — the reference
    declares every table schema at registration, context.py:110-154)."""
    return spark.read.schema(schema).option("header", "true").csv(path)


def write_csv(df: DataFrame, dest: str, mode: str = "overwrite") -> None:
    """A4: CSV sink with header (reference prediction/entity exports,
    /root/reference/claude_poc/entity-resolution_v4.py:1363)."""
    df.write.mode(mode).option("header", "true").csv(dest)


def read_jsonl(
    spark: SparkSession, path: str, schema: str | T.StructType
) -> DataFrame:
    """JSONL (newline-delimited JSON) scan with an ENFORCED schema — the
    interchange format training-data pipelines actually live on (one JSON
    object per line; the document corpora public pipelines publish ship
    this way). Schema is required, never inferred: inference needs an
    extra full pass over 100 TB and silently widens types on dirty rows.
    Corrupt lines land in `_corrupt_record` when the schema declares it;
    otherwise mode=PERMISSIVE nulls them per-column (Spark default).
    Reference analog: the enforced-schema table registration,
    /root/reference/record_matching/context.py:110-154."""
    return spark.read.schema(schema).json(path)


def write_jsonl(
    df: DataFrame,
    dest: str,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """JSONL sink (one JSON object per line, one file per partition —
    gzip/zstd via `compression` for shipping). Spark's json writer emits
    newline-delimited objects, so the output is directly consumable by any
    JSONL reader."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(dest)


def write_stage(
    df: DataFrame,
    dest: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Stage sink: Parquet directory (or Iceberg table when available),
    optionally hive-partitioned — the reference partitions its templated
    stage by `key` (/root/reference/record_matching/context.py:122); our
    pipeline partitions blocks/pairs by block-key bucket when asked."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "iceberg":
        df.writeTo(dest).createOrReplace()
        return
    w.format(fmt).save(dest)
