"""Stage S6/S7: pairwise feature computation + weighted match scoring.

Reference analogs:
- per-field pairwise distances batched on CUDA tensors
  (/root/reference/record_matching/main.py:353-434) → batched numpy inside
  Arrow pandas UDFs (TF-IDF cosine, Jaro-Winkler); Levenshtein and Jaccard
  stay fully JVM-side (Spark built-ins).
- logistic score sigmoid(x·w + b) (/root/reference/record_matching/
  main.py:494-501,606-626) → pure Catalyst expression over broadcast
  weights (no UDF in the scoring hot path).
- weight training via sklearn liblinear (/root/reference/record_matching/
  main.py:444-486) → pyspark.ml LogisticRegression (distributed).
- embed-each-distinct-value-once economy (/root/reference/record_matching/
  main.py:89-93) → features computed once per distinct (content_sha_l,
  content_sha_r) pair, joined back to file pairs.

Feature vector (per candidate pair):
  jaccard    — |tokens_l ∩ tokens_r| / |tokens_l ∪ tokens_r|   (Catalyst)
  tfidf_cos  — cosine of L2-normalized TF-IDF vectors           (pandas UDF)
  lev_sig    — 1 - lev(sig_l, sig_r)/max(len)  on the sorted-token signature
                                                                (Catalyst)
  jw_path    — Jaro-Winkler on file paths                       (pandas UDF)
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

FEATURES = ["jaccard", "tfidf_cos", "lev_sig", "jw_path"]

# fallback weights (logistic) — replaced by train_weights() output when
# labeled pairs are available. Chosen so each feature contributes comparably
# and score 0.5 sits near feature ≈ 0.55 average.
DEFAULT_WEIGHTS: dict[str, float] = {
    "intercept": -14.0,
    "jaccard": 9.0,
    "tfidf_cos": 9.0,
    "lev_sig": 5.0,
    "jw_path": 2.0,
}

_SIG_TOKENS = 40  # sorted distinct tokens joined into the levenshtein signature


# ---------------------------------------------------------------- features


def sha_features(files: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Per-distinct-content feature table keyed by content_sha.

    Columns: content_sha, toks (sorted distinct tokens), sig (levenshtein
    signature string), tid (sorted token-hash ids), tw (L2-normalized TF-IDF
    weights, aligned with tid). All Catalyst except nothing — fully JVM-side.
    """
    docs = files.select("content_sha", tokens_col).dropDuplicates(["content_sha"])
    docs = docs.withColumn("toks", F.array_sort(F.array_distinct(F.col(tokens_col))))
    n_docs = docs.count()

    tf = (
        docs.select("content_sha", F.explode_outer("toks").alias("tok"))
        .groupBy("content_sha", "tok")
        .agg(F.count("*").alias("tf"))
    )
    df_tok = tf.groupBy("tok").agg(F.count("*").alias("df"))
    weighted = (
        tf.join(df_tok, "tok")
        .withColumn(
            "w",
            (F.lit(1.0) + F.log(F.col("tf").cast("double")))
            * (F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0),
        )
        .withColumn("tid", F.xxhash64("tok"))
    )
    vecs = (
        weighted.groupBy("content_sha")
        .agg(F.array_sort(F.collect_list(F.struct("tid", "w"))).alias("tv"))
        .withColumn(
            "norm",
            F.sqrt(F.aggregate("tv", F.lit(0.0), lambda acc, x: acc + x["w"] * x["w"])),
        )
        .select(
            "content_sha",
            F.transform("tv", lambda x: x["tid"]).alias("tid"),
            F.transform("tv", lambda x: x["w"] / F.col("norm")).alias("tw"),
        )
    )
    sigs = docs.select(
        "content_sha",
        F.substring(F.concat_ws(" ", F.slice("toks", 1, _SIG_TOKENS)), 1, 512).alias("sig"),
        F.col("toks"),
    )
    return sigs.join(vecs, "content_sha", "left")


@F.pandas_udf(DoubleType())
def _cosine_udf(
    tid_l: pd.Series, tw_l: pd.Series, tid_r: pd.Series, tw_r: pd.Series
) -> pd.Series:
    """Sparse-vector cosine per pair; ids are sorted & unique per side."""
    out = np.zeros(len(tid_l))
    for i in range(len(tid_l)):
        a_id, a_w, b_id, b_w = tid_l[i], tw_l[i], tid_r[i], tw_r[i]
        if a_id is None or b_id is None or len(a_id) == 0 or len(b_id) == 0:
            continue
        a_id = np.asarray(a_id, dtype=np.int64)
        b_id = np.asarray(b_id, dtype=np.int64)
        common, ia, ib = np.intersect1d(a_id, b_id, assume_unique=True, return_indices=True)
        if len(common):
            out[i] = float(
                np.dot(np.asarray(a_w, dtype=np.float64)[ia],
                       np.asarray(b_w, dtype=np.float64)[ib])
            )
    return pd.Series(out)


def _jaro_winkler(s1: str, s2: str) -> float:
    """Plain-Python Jaro-Winkler (public algorithm, Winkler 1990). Runs only
    inside Arrow batches on short strings (paths)."""
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    flags1 = [False] * l1
    flags2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(l2, i + window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c:
                flags1[i] = True
                flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(l1):
        if flags1[i]:
            while not flags2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    jaro = (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a == b:
            prefix += 1
        else:
            break
    return jaro + prefix * 0.1 * (1.0 - jaro)


@F.pandas_udf(DoubleType())
def _jw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [_jaro_winkler(x or "", y or "") for x, y in zip(a.tolist(), b.tolist())]
    )


def pair_features(
    pairs: DataFrame,
    files: DataFrame,
    tokens_col: str = "tokens",
    shaf: DataFrame | None = None,
) -> DataFrame:
    """Featurize candidate pairs (left, right are file_ids).

    Content features are computed once per distinct canonical
    (sha_a ≤ sha_b) pair, then joined back — the dedup-before-expensive-
    compute economy. jw_path is per file pair (cheap, path-level).
    Output: left, right, jaccard, tfidf_cos, lev_sig, jw_path.
    """
    meta = files.select("file_id", "content_sha", "path")
    p = (
        pairs.select("left", "right")
        .join(
            meta.select(
                F.col("file_id").alias("left"),
                F.col("content_sha").alias("sha_l"),
                F.col("path").alias("path_l"),
            ),
            "left",
        )
        .join(
            meta.select(
                F.col("file_id").alias("right"),
                F.col("content_sha").alias("sha_r"),
                F.col("path").alias("path_r"),
            ),
            "right",
        )
        .withColumn("sha_a", F.least("sha_l", "sha_r"))
        .withColumn("sha_b", F.greatest("sha_l", "sha_r"))
    )

    if shaf is None:
        shaf = sha_features(files, tokens_col=tokens_col)
    sha_pairs = p.select("sha_a", "sha_b").distinct()
    fa = shaf.select(
        F.col("content_sha").alias("sha_a"),
        F.col("toks").alias("toks_a"),
        F.col("sig").alias("sig_a"),
        F.col("tid").alias("tid_a"),
        F.col("tw").alias("tw_a"),
    )
    fb = shaf.select(
        F.col("content_sha").alias("sha_b"),
        F.col("toks").alias("toks_b"),
        F.col("sig").alias("sig_b"),
        F.col("tid").alias("tid_b"),
        F.col("tw").alias("tw_b"),
    )
    sp = sha_pairs.join(fa, "sha_a").join(fb, "sha_b")
    union_sz = F.size(F.array_union("toks_a", "toks_b"))
    sha_scored = sp.select(
        "sha_a",
        "sha_b",
        F.when(F.col("sha_a") == F.col("sha_b"), F.lit(1.0))
        .when(union_sz == 0, F.lit(0.0))
        .otherwise(
            F.size(F.array_intersect("toks_a", "toks_b")).cast("double") / union_sz
        )
        .alias("jaccard"),
        F.when(F.col("sha_a") == F.col("sha_b"), F.lit(1.0))
        .otherwise(_cosine_udf("tid_a", "tw_a", "tid_b", "tw_b"))
        .alias("tfidf_cos"),
        F.when(F.col("sha_a") == F.col("sha_b"), F.lit(1.0))
        .otherwise(
            F.lit(1.0)
            - F.levenshtein("sig_a", "sig_b").cast("double")
            / F.greatest(F.length("sig_a"), F.length("sig_b"), F.lit(1))
        )
        .alias("lev_sig"),
    )
    return (
        p.join(sha_scored, ["sha_a", "sha_b"])
        .withColumn("jw_path", _jw_udf("path_l", "path_r"))
        .select("left", "right", *FEATURES)
    )


# ----------------------------------------------------------------- scoring


def score_pairs(feats: DataFrame, weights: dict[str, float] | None = None) -> DataFrame:
    """score = sigmoid(w·x + b), pure Catalyst (reference: main.py:494-501)."""
    w = weights or DEFAULT_WEIGHTS
    z = F.lit(float(w["intercept"]))
    for name in FEATURES:
        z = z + F.lit(float(w[name])) * F.col(name)
    return feats.withColumn("score", F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def train_weights(labeled_feats: DataFrame, max_iter: int = 60) -> dict[str, float]:
    """Fit logistic-regression weights on labeled featurized pairs
    (columns FEATURES + boolean `match`). Distributed via pyspark.ml —
    replaces the reference's driver-side sklearn fit (main.py:444-486)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    assembler = VectorAssembler(inputCols=FEATURES, outputCol="fvec")
    train = assembler.transform(
        labeled_feats.withColumn("label", F.col("match").cast("double"))
    )
    lr = LogisticRegression(
        featuresCol="fvec", labelCol="label", maxIter=max_iter, regParam=1e-4
    )
    model = lr.fit(train)
    out = {"intercept": float(model.intercept)}
    for name, coef in zip(FEATURES, model.coefficients):
        out[name] = float(coef)
    return out


def choose_threshold(scored_labeled: DataFrame, grid: int = 99) -> tuple[float, float]:
    """Sweep thresholds on scored labeled pairs, return (best_tau, best_f1).

    Reference analog: POC v2 threshold sweep (claude_poc_v2/
    vector_enhanced_entity_resolution_v2.py:2540-2546). One pass: bin scores,
    aggregate pos/neg counts per bin, cumulative sums on the (tiny) driver.
    """
    binned = (
        scored_labeled.select(
            F.least(F.lit(grid), F.floor(F.col("score") * (grid + 1)).cast("int")).alias("bin"),
            F.col("match").cast("int").alias("pos"),
        )
        .groupBy("bin")
        .agg(F.sum("pos").alias("pos"), F.count("*").alias("n"))
        .collect()
    )
    pos = [0] * (grid + 1)
    neg = [0] * (grid + 1)
    for r in binned:
        pos[r["bin"]] = r["pos"]
        neg[r["bin"]] = r["n"] - r["pos"]
    total_pos = sum(pos)
    best = (0.5, 0.0)
    tp = total_pos
    fp = sum(neg)
    for b in range(grid + 1):
        tau = b / (grid + 1)
        if tp + fp > 0 and total_pos > 0:
            prec = tp / (tp + fp)
            rec = tp / total_pos
            f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
            if f1 > best[1]:
                best = (tau, f1)
        tp -= pos[b]
        fp -= neg[b]
    return best


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))
