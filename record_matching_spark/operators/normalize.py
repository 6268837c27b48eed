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


# identifier-synonym table — the code-domain analog of the reference's
# name-abbreviation expansion (wm.→william, thos.→thomas …,
# /root/reference/claude_poc_v2/vector_enhanced_entity_resolution_v2.py:917-962):
# fold common identifier abbreviations to one canonical token before
# similarity, so `cfg_parser` and `config_parser` tokenize identically.
IDENTIFIER_SYNONYMS: dict[str, str] = {
    "cfg": "config", "conf": "config",
    "init": "initialize", "str": "string", "num": "number", "idx": "index",
    "len": "length", "msg": "message", "err": "error", "val": "value",
    "fn": "function", "func": "function", "impl": "implementation",
    "util": "utility", "utils": "utility", "calc": "calculate",
    "tmp": "temporary", "temp": "temporary", "buf": "buffer",
    "ptr": "pointer", "ctx": "context", "db": "database",
    "dir": "directory", "src": "source", "dst": "destination",
    "dest": "destination", "obj": "object", "arr": "array",
    "param": "parameter", "params": "parameters", "args": "arguments",
    "env": "environment", "max": "maximum", "min": "minimum",
    "doc": "document", "docs": "documents", "repo": "repository",
}


def fold_identifiers(tokens_col: Column) -> Column:
    """Map each token through IDENTIFIER_SYNONYMS (B10 analog). Pure
    Catalyst: a literal map + element_at per token, no UDF."""
    m = F.create_map(
        *[F.lit(x) for kv in sorted(IDENTIFIER_SYNONYMS.items()) for x in kv]
    )
    return F.transform(tokens_col, lambda t: F.coalesce(F.element_at(m, t), t))


def strip_comments(col: Column) -> Column:
    """Remove block (/* */), line (//) and hash (#) comments before
    tokenization — comment churn is mutation noise, not identity (the
    reference strips punctuation/noise before name comparison,
    claude_poc_v2:941-959). Pure Catalyst regexp_replace chain."""
    c = F.regexp_replace(col, r"/\*[\s\S]*?\*/", " ")
    c = F.regexp_replace(c, r"//[^\n]*", " ")
    c = F.regexp_replace(c, r"#[^\n]*", " ")
    return c


def tokenize_normalized(col: Column, fold: bool = True,
                        drop_comments: bool = True) -> Column:
    """tokenize with optional comment stripping + identifier folding —
    the full B1+B10 normalization chain."""
    c = strip_comments(col) if drop_comments else col
    toks = tokenize(c)
    return fold_identifiers(toks) if fold else toks


def char_shingles(col: Column, k: int = 8) -> Column:
    """All k-char shingles of a text column (array<string>); texts shorter
    than k yield one (truncated) shingle. Alphabet-independent — covers
    non-Latin scripts the word tokenizer maps to empty sets. Pure Catalyst."""
    starts = F.sequence(F.lit(1), F.greatest(F.length(col) - F.lit(k - 1), F.lit(1)))
    return F.transform(starts, lambda i: F.substr(col, i, F.lit(k)))


def normalize_files(
    files: DataFrame, content_col: str = "content", id_bits: int = 64
) -> DataFrame:
    """Add the engine's derived columns to a repo_files-shaped table.

    - file_id      : sha2(repo|path|commit) — stable record id
    - fid          : compact surrogate id used for blocking/pairing/
                     clustering shuffles instead of the 64-char string.
                     id_bits=64 → xxhash64(file_id), 8 bytes; a collision
                     merges two records with probability n²/2⁶⁵.
                     id_bits=128 → struct<h1,h2> of two independently-seeded
                     xxhash64s (collision n²/2¹²⁹) — the 10¹²-file-scale
                     option; struct keys flow through every join/groupBy/
                     least/greatest in the engine unchanged (verified by
                     tests/test_pipeline_e2e.py::test_wide_ids_equivalent).
    - content_sha  : sha2(content, 256) — per-row invariant vs the source table
    - tokens       : lowercased word tokens (array<string>)
    - n_tokens     : token count
    """
    if id_bits not in (64, 128):
        raise ValueError("id_bits must be 64 or 128")
    out = files
    if "file_id" not in files.columns:
        out = out.withColumn(
            "file_id", F.sha2(F.concat_ws("|", "repo", "path", "commit"), 256)
        )
    if "content_sha" not in files.columns:
        out = out.withColumn("content_sha", F.sha2(F.col(content_col), 256))
    fid = (
        F.xxhash64("file_id")
        if id_bits == 64
        else F.struct(
            F.xxhash64("file_id").alias("h1"),
            F.xxhash64(F.lit("fid2"), F.col("file_id")).alias("h2"),
        )
    )
    return (
        out.withColumn("fid", fid)
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
