"""B24: query-by-string search over a documents-shaped table.

Reference analog: /root/reference/record_matching/main.py:504-549
(`search_string`: embed the query → ANN search → join records → sort by
distance). No external embedding service exists here, so the query is
tokenized driver-side (one tiny literal array broadcast into the plan) and
the corpus is ranked by token containment + Jaccard — a single scan with
pure-Catalyst scoring, then a global top-k. The scale shape is exactly a
filter+top-k over one pass; no index service, no driver collect of the
corpus.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from record_matching_spark.operators.normalize import tokenize

_TOKEN_SPLIT = re.compile(r"[^a-z0-9_]+")


def query_tokens(query: str) -> list[str]:
    """Driver-side twin of operators.normalize.tokenize (same alphabet)."""
    return sorted({t for t in _TOKEN_SPLIT.split(query.lower()) if len(t) >= 2})


def search_text(
    docs: DataFrame,
    query: str,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for a free-text query.

    Ranking: containment (|q ∩ d| / |q| — how much of the query the doc
    covers) first, token-set Jaccard as tie-break, then id for determinism.
    Output: (<id_col>, containment, jaccard, rank).
    """
    toks = query_tokens(query)
    if not toks:
        return docs.select(
            F.col(id_col),
            F.lit(0.0).alias("containment"),
            F.lit(0.0).alias("jaccard"),
            F.lit(1).alias("rank"),
        ).limit(0)
    qarr = F.array(*[F.lit(t) for t in toks])
    dt = F.array_distinct(tokenize(F.col(text_col)))
    inter = F.size(F.array_intersect(dt, qarr)).cast("double")
    union = F.size(F.array_union(dt, qarr)).cast("double")
    scored = docs.select(
        F.col(id_col),
        (inter / F.lit(float(len(toks)))).alias("containment"),
        F.when(union == 0, F.lit(0.0)).otherwise(inter / union).alias("jaccard"),
    ).filter(F.col("containment") > 0)
    # limit-first keeps the global sort tiny (TakeOrderedAndProject); the
    # window then ranks only k rows
    ranked = scored.orderBy(
        F.desc("containment"), F.desc("jaccard"), F.asc(id_col)
    ).limit(k)
    w = Window.orderBy(F.desc("containment"), F.desc("jaccard"), F.asc(id_col))
    return ranked.withColumn("rank", F.row_number().over(w))
