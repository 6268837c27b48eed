"""Scorer features vs hand-computed oracles (FIXTURES.md §5)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from record_matching_spark.operators.normalize import normalize_files
from record_matching_spark.operators.scoring import (
    _jaro_winkler,
    pair_features,
    score_pairs,
    train_weights,
)


def test_jaro_winkler_known_values():
    # classic published examples (Winkler 1990)
    assert _jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-4)
    assert _jaro_winkler("DWAYNE", "DUANE") == pytest.approx(0.8400, abs=1e-4)
    assert _jaro_winkler("DIXON", "DICKSONX") == pytest.approx(0.8133, abs=1e-4)
    assert _jaro_winkler("abc", "abc") == 1.0
    assert _jaro_winkler("abc", "xyz") == 0.0
    assert _jaro_winkler("", "abc") == 0.0


def _mk_files(spark, contents):
    rows = [(f"r{i}", f"p{i}.py", f"c{i:040d}", "python", c)
            for i, c in enumerate(contents)]
    return normalize_files(
        spark.createDataFrame(
            rows, "repo string, path string, commit string, lang string, content string"
        )
    )


def test_pair_features_oracle(spark):
    files = _mk_files(spark, [
        "alpha beta gamma delta",
        "alpha beta gamma epsilon",
        "zz yy xx ww",
    ]).cache()
    ids = {r["path"]: r["file_id"] for r in files.select("path", "file_id").collect()}
    pairs = spark.createDataFrame(
        [(min(ids["p0.py"], ids["p1.py"]), max(ids["p0.py"], ids["p1.py"])),
         (min(ids["p0.py"], ids["p2.py"]), max(ids["p0.py"], ids["p2.py"]))],
        "left string, right string",
    )
    got = {}
    for r in pair_features(pairs, files).collect():
        key = "sim" if r["jaccard"] > 0.3 else "diff"
        got[key] = r

    # jaccard: {alpha,beta,gamma,delta} vs {alpha,beta,gamma,epsilon} = 3/5
    assert got["sim"]["jaccard"] == pytest.approx(3 / 5)
    assert got["diff"]["jaccard"] == 0.0
    assert got["diff"]["tfidf_cos"] == 0.0

    # tfidf cosine oracle: tf=1 for all; N=3 docs
    def idf(df_count):
        return math.log((3 + 1) / (df_count + 1)) + 1
    # doc0/doc1: shared tokens alpha,beta,gamma have df=2; delta/epsilon df=1
    w_shared = idf(2)
    w_uniq = idf(1)
    norm = math.sqrt(3 * w_shared**2 + w_uniq**2)
    expect_cos = 3 * w_shared**2 / norm**2
    assert got["sim"]["tfidf_cos"] == pytest.approx(expect_cos, abs=1e-6)

    # metadata features (B11): same lang + same dir ("") → both 1.0 here
    assert got["sim"]["same_lang"] == 1.0
    assert got["sim"]["dir_sim"] == 1.0

    # identical-content pair → all features 1
    files2 = _mk_files(spark, ["same text here", "same text here"])
    ids2 = sorted(r["file_id"] for r in files2.select("file_id").collect())
    pairs2 = spark.createDataFrame([tuple(ids2)], "left string, right string")
    r = pair_features(pairs2, files2).collect()[0]
    assert r["jaccard"] == 1.0 and r["tfidf_cos"] == 1.0 and r["lev_sig"] == 1.0


def test_metadata_features(spark):
    """B11: lang mismatch and directory overlap are scored features."""
    rows = [
        ("r0", "src/a/x.py", "c0", "python", "alpha beta"),
        ("r1", "src/a/y.java", "c1", "java", "alpha beta"),
        ("r2", "lib/b/z.py", "c2", "python", "alpha beta"),
    ]
    files = normalize_files(spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    ))
    ids = {r["path"].split("/")[-1]: r["file_id"]
           for r in files.select("path", "file_id").collect()}
    def pair(a, b):
        return (min(ids[a], ids[b]), max(ids[a], ids[b]))
    pairs = spark.createDataFrame(
        [pair("x.py", "y.java"), pair("x.py", "z.py")], "left string, right string"
    )
    feats = {(r["left"], r["right"]): r for r in pair_features(pairs, files).collect()}
    xy = feats[pair("x.py", "y.java")]
    xz = feats[pair("x.py", "z.py")]
    assert xy["same_lang"] == 0.0 and xz["same_lang"] == 1.0
    assert xy["dir_sim"] == 1.0          # src/a == src/a
    assert xz["dir_sim"] == 0.0          # src/a vs lib/b


def test_score_monotone(spark):
    df = spark.createDataFrame(
        [("a", "b", 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.0, 0.0),
         ("c", "d", 0.1, 0.1, 0.2, 0.5, 1.0, 0.5, 0.0, 0.0)],
        "left string, right string, jaccard double, tfidf_cos double, "
        "lev_sig double, jw_path double, same_lang double, dir_sim double, "
        "any_empty double, both_empty double",
    )
    rows = {(r["left"]): r["score"] for r in score_pairs(df).collect()}
    assert rows["a"] > 0.9
    assert rows["c"] < 0.1


def test_train_weights_separates(spark):
    import random
    rng = random.Random(3)
    rows = []
    for i in range(300):
        match = i % 2 == 0
        base = 0.85 if match else 0.25
        rows.append((
            f"l{i}", f"r{i}",
            min(1.0, max(0.0, base + rng.uniform(-0.1, 0.1))),
            min(1.0, max(0.0, base + rng.uniform(-0.1, 0.1))),
            min(1.0, max(0.0, base + rng.uniform(-0.1, 0.1))),
            0.5,
            1.0,
            min(1.0, max(0.0, base + rng.uniform(-0.1, 0.1))),
            0.0,
            0.0,
            match,
        ))
    df = spark.createDataFrame(
        rows, "left string, right string, jaccard double, tfidf_cos double, "
              "lev_sig double, jw_path double, same_lang double, dir_sim double, "
              "any_empty double, both_empty double, match boolean")
    w = train_weights(df)
    scored = score_pairs(df, w)
    bad = scored.filter(
        (F.col("match") & (F.col("score") < 0.5))
        | (~F.col("match") & (F.col("score") > 0.5))
    ).count()
    assert bad == 0
