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
from pyspark.sql.types import DoubleType, StructField, StructType

# NOTE: no Jaro-Winkler on the content signature — pure-Python JW is
# ~1 ms/pair on 160-char strings (measured), which would dominate the whole
# scoring stage. JW runs only on short path strings; content similarity
# comes from TF-IDF cosine + Jaccard (Arrow/numpy) + Levenshtein (JVM).
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

# sorted distinct tokens joined into the levenshtein signature. Kept short:
# levenshtein is O(len²) per pair and dominates pair-featurization cost —
# 16 tokens / 160 chars keeps the feature discriminative at ~10× less work
# than a 512-char signature.
_SIG_TOKENS = 16
_SIG_CHARS = 160


# ---------------------------------------------------------------- features


def sha_features(files: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Per-distinct-content feature table keyed by content_sha.

    Columns: content_sha, sig (levenshtein signature string, ≤160 chars),
    tid (sorted int32 token-hash ids), tw (L2-normalized float32 TF-IDF
    weights aligned with tid). Fully JVM-side.

    The payload is deliberately COMPACT — this table is joined onto every
    candidate sha-pair, so its row width is the scoring stage's shuffle
    volume: int32 ids + float32 weights + a short signature ≈ 0.8 KB/row vs
    ~3 KB when shipping raw token strings (a 32-bit token-hash collision
    inside one pair's union perturbs jaccard by ~1%, far below the decision
    margin)."""
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
        .withColumn(
            "tid", F.xxhash64("tok").bitwiseAND(F.lit(0x7FFFFFFF)).cast("int")
        )
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
            F.transform("tv", lambda x: (x["w"] / F.col("norm")).cast("float")).alias("tw"),
        )
    )
    sigs = docs.select(
        "content_sha",
        F.substring(
            F.concat_ws(" ", F.slice("toks", 1, _SIG_TOKENS)), 1, _SIG_CHARS
        ).alias("sig"),
    )
    return sigs.join(vecs, "content_sha", "left")


_SIM_SCHEMA = StructType(
    [StructField("cos", DoubleType()), StructField("jac", DoubleType())]
)


@F.pandas_udf(_SIM_SCHEMA)
def _content_sim_udf(
    tid_l: pd.Series, tw_l: pd.Series, tid_r: pd.Series, tw_r: pd.Series
) -> pd.DataFrame:
    """Per pair: sparse TF-IDF cosine + token-set Jaccard from the sorted
    token-id arrays (one Arrow pass computes both)."""
    n = len(tid_l)
    cos = np.zeros(n)
    jac = np.zeros(n)
    for i in range(n):
        a_id, a_w, b_id, b_w = tid_l[i], tw_l[i], tid_r[i], tw_r[i]
        if a_id is None or b_id is None or len(a_id) == 0 or len(b_id) == 0:
            continue
        a_id = np.asarray(a_id, dtype=np.int64)
        b_id = np.asarray(b_id, dtype=np.int64)
        common, ia, ib = np.intersect1d(a_id, b_id, return_indices=True)
        union = len(a_id) + len(b_id) - len(common)
        if union:
            jac[i] = len(common) / union
        if len(common):
            cos[i] = float(
                np.dot(np.asarray(a_w, dtype=np.float64)[ia],
                       np.asarray(b_w, dtype=np.float64)[ib])
            )
    return pd.DataFrame({"cos": cos, "jac": jac})


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


def _content_feature_cols(suffix_a: str = "_a", suffix_b: str = "_b") -> list:
    """Feature expressions over attached per-content columns
    (sig/tid/tw with the given suffixes); identical-content pairs short-
    circuit to 1.0 without touching the UDF output."""
    same = F.col(f"csid{suffix_a}") == F.col(f"csid{suffix_b}")
    sim = _content_sim_udf(
        f"tid{suffix_a}", f"tw{suffix_a}", f"tid{suffix_b}", f"tw{suffix_b}"
    )
    lev = F.lit(1.0) - F.levenshtein(
        f"sig{suffix_a}", f"sig{suffix_b}"
    ).cast("double") / F.greatest(
        F.length(f"sig{suffix_a}"), F.length(f"sig{suffix_b}"), F.lit(1)
    )
    return [
        F.when(same, F.struct(F.lit(1.0).alias("cos"), F.lit(1.0).alias("jac")))
        .otherwise(sim)
        .alias("_sim"),
        F.when(same, F.lit(1.0)).otherwise(lev).alias("lev_sig"),
    ]


def pair_features(
    pairs: DataFrame,
    files: DataFrame,
    tokens_col: str = "tokens",
    shaf: DataFrame | None = None,
    id_col: str = "file_id",
    dedup_content: bool | None = None,
) -> DataFrame:
    """Featurize candidate pairs (left/right are values of `id_col` —
    pass id_col="fid" for the compact-surrogate pipeline path).

    All join keys are int64 surrogates: record ids via `id_col`, contents
    via csid = xxhash64(content_sha) — a 64-char sha never rides a shuffle.

    Two plans, picked by the corpus' duplicate ratio (overridable):
    - dedup_content=True  — content features computed once per distinct
      canonical (csid_a ≤ csid_b) pair, joined back (the reference's
      embed-each-distinct-value-once economy, main.py:89-93). Wins when
      many files share identical content.
    - dedup_content=False — features computed directly per file pair
      (skips the distinct + join-back shuffles). Wins when contents are
      mostly unique (mutation-heavy corpora).
    Output: left, right, jaccard, tfidf_cos, lev_sig, jw_sig, jw_path.
    """
    if shaf is None:
        shaf = sha_features(files, tokens_col=tokens_col)
    shafk = shaf.withColumn("csid", F.xxhash64("content_sha")).drop("content_sha")

    if dedup_content is None:
        n_files = files.count()
        n_shas = shafk.count()
        dedup_content = n_files > 1.3 * n_shas

    meta = files.select(
        F.col(id_col), F.xxhash64("content_sha").alias("csid"), F.col("path")
    )
    p = (
        pairs.select("left", "right")
        .join(
            meta.select(
                F.col(id_col).alias("left"),
                F.col("csid").alias("csid_l"),
                F.col("path").alias("path_l"),
            ),
            "left",
        )
        .join(
            meta.select(
                F.col(id_col).alias("right"),
                F.col("csid").alias("csid_r"),
                F.col("path").alias("path_r"),
            ),
            "right",
        )
    )

    def feat(df: DataFrame, sa: str, sb: str) -> DataFrame:
        return df.select(
            "*",
            *[c for c in _content_feature_cols(sa, sb)],
        ).withColumns(
            {
                "jaccard": F.col("_sim.jac"),
                "tfidf_cos": F.col("_sim.cos"),
            }
        )

    if dedup_content:
        p = p.withColumn("csid_a", F.least("csid_l", "csid_r")).withColumn(
            "csid_b", F.greatest("csid_l", "csid_r")
        )
        sha_pairs = p.select("csid_a", "csid_b").distinct()
        fa = shafk.select(
            F.col("csid").alias("csid_a"), F.col("sig").alias("sig_a"),
            F.col("tid").alias("tid_a"), F.col("tw").alias("tw_a"),
        )
        fb = shafk.select(
            F.col("csid").alias("csid_b"), F.col("sig").alias("sig_b"),
            F.col("tid").alias("tid_b"), F.col("tw").alias("tw_b"),
        )
        sha_scored = feat(sha_pairs.join(fa, "csid_a").join(fb, "csid_b"), "_a", "_b").select(
            "csid_a", "csid_b", "jaccard", "tfidf_cos", "lev_sig"
        )
        return (
            p.join(sha_scored, ["csid_a", "csid_b"])
            .withColumn("jw_path", _jw_udf("path_l", "path_r"))
            .select("left", "right", *FEATURES)
        )

    fa = shafk.select(
        F.col("csid").alias("csid_l"), F.col("sig").alias("sig_l"),
        F.col("tid").alias("tid_l"), F.col("tw").alias("tw_l"),
    )
    fb = shafk.select(
        F.col("csid").alias("csid_r"), F.col("sig").alias("sig_r"),
        F.col("tid").alias("tid_r"), F.col("tw").alias("tw_r"),
    )
    out = feat(p.join(fa, "csid_l").join(fb, "csid_r"), "_l", "_r")
    return out.withColumn("jw_path", _jw_udf("path_l", "path_r")).select(
        "left", "right", *FEATURES
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


def train_random_forest(labeled_feats: DataFrame, num_trees: int = 100,
                        seed: int = 23):
    """Alternative pair classifier: RandomForest (reference POC v2,
    claude_poc_v2/vector_enhanced_entity_resolution_v2.py:2376-2572 —
    100 trees, seed 23). Returns (model, feature_importances dict).
    Use model.transform(assembled) for scoring; the logistic path
    (train_weights/score_pairs) stays the default because its scoring is
    pure Catalyst."""
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import VectorAssembler

    assembler = VectorAssembler(inputCols=FEATURES, outputCol="fvec")
    train = assembler.transform(
        labeled_feats.withColumn("label", F.col("match").cast("double"))
    )
    rf = RandomForestClassifier(
        featuresCol="fvec", labelCol="label", numTrees=num_trees, seed=seed
    )
    model = rf.fit(train)
    importances = {
        name: float(v) for name, v in zip(FEATURES, model.featureImportances)
    }
    return model, importances


def score_pairs_rf(feats: DataFrame, model) -> DataFrame:
    """Score candidate pairs with a trained RandomForest model; emits the
    same (…, score) shape as score_pairs."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import vector_to_array

    assembler = VectorAssembler(inputCols=FEATURES, outputCol="fvec")
    out = model.transform(assembler.transform(feats))
    return out.withColumn(
        "score", vector_to_array("probability").getItem(1)
    ).drop("fvec", "rawPrediction", "probability", "prediction")


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
