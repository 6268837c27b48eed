"""Stage S1/S2: ingest invariant + normalization + tokenization.

Reference analog: field templating/normalization
(/root/reference/record_matching/main.py:75-86, TEMPLATES main.py:40-53;
name normalization /root/reference/claude_poc_v2/
vector_enhanced_entity_resolution_v2.py:917-962) and the content-hash id
column (/root/reference/record_matching/context.py:9-11).

Everything here is pure Catalyst (whole-stage-codegen'd): lower/regexp
tokenization, sha2 hashing. No Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# split on anything that is not [a-z0-9_]; drop empties and 1-char noise
_TOKEN_SPLIT = r"[^a-z0-9_]+"


def tokenize(col: Column) -> Column:
    """Lowercased word tokens of a code/text column (array<string>)."""
    return F.filter(
        F.split(F.lower(col), _TOKEN_SPLIT),
        lambda t: F.length(t) >= 2,
    )


def normalize_files(files: DataFrame, content_col: str = "content") -> DataFrame:
    """Add the engine's derived columns to a repo_files-shaped table.

    - file_id      : sha2(repo|path|commit) — stable record id
    - fid          : xxhash64(file_id) — compact int64 surrogate id used for
                     blocking/pairing/clustering shuffles (8 bytes instead of
                     a 64-char string; a collision merges two records, with
                     probability n²/2⁶⁵ — at 10¹²-file scale widen to 128 bits
                     by adding a second seeded hash column to every join key)
    - content_sha  : sha2(content, 256) — per-row invariant vs the source table
    - tokens       : lowercased word tokens (array<string>)
    - n_tokens     : token count
    """
    out = files
    if "file_id" not in files.columns:
        out = out.withColumn(
            "file_id", F.sha2(F.concat_ws("|", "repo", "path", "commit"), 256)
        )
    if "content_sha" not in files.columns:
        out = out.withColumn("content_sha", F.sha2(F.col(content_col), 256))
    return (
        out.withColumn("fid", F.xxhash64("file_id"))
        .withColumn("tokens", tokenize(F.col(content_col)))
        .withColumn("n_tokens", F.size("tokens"))
    )


def assert_sha_invariant(files: DataFrame, source: DataFrame) -> int:
    """Per-row invariant: our content_sha equals sha2(content,256) of the
    source table for every (repo, path, commit). Returns violation count
    (0 = pass). Reference analog: the stable hash id threaded through every
    stage (/root/reference/record_matching/context.py:9-11)."""
    src = source.select(
        "repo", "path", "commit", F.sha2("content", 256).alias("src_sha")
    )
    joined = files.select("repo", "path", "commit", "content_sha").join(
        src, ["repo", "path", "commit"], "inner"
    )
    return joined.filter(F.col("content_sha") != F.col("src_sha")).count()
