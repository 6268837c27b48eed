"""Round-2 operators: search (B24), normalization analogs (B10), SQL surface
(A25), shingle-LSH dedup, empty-token dedup semantics (ADVICE), RF CV (B19),
and the CSV source/sink round-trip (A1/A4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------- B24 search


def test_search_text_finds_source_doc(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "quick brown foxes are rare in boxes"),
        ],
        "doc_id long, text string",
    )
    from record_matching_spark.functions.search import search_text

    hits = search_text(docs, "quick brown fox", k=2).collect()
    assert hits[0]["doc_id"] == 1 and hits[0]["rank"] == 1
    assert hits[0]["containment"] == 1.0
    assert hits[1]["doc_id"] == 3  # partial match ranks second

    assert search_text(docs, "!!! ???", k=3).count() == 0


# ------------------------------------------------- B10 normalization analog


def test_identifier_folding_and_comment_stripping(spark):
    from record_matching_spark.operators.normalize import (
        tokenize,
        tokenize_normalized,
    )

    df = spark.createDataFrame(
        [("a", "cfg = init(buf) // tmp comment about ptr\nval = cfg")],
        "id string, content string",
    )
    plain = df.select(tokenize(F.col("content")).alias("t")).collect()[0]["t"]
    folded = df.select(tokenize_normalized(F.col("content")).alias("t")).collect()[0]["t"]
    assert "cfg" in plain and "tmp" in plain and "comment" in plain
    assert "config" in folded and "cfg" not in folded
    assert "buffer" in folded and "initialize" in folded
    # comment text gone entirely
    assert "comment" not in folded and "temporary" not in folded

    # folding makes abbreviated vs expanded identifiers tokenize identically
    a = spark.createDataFrame([("x", "cfg parser err")], "id string, content string")
    b = spark.createDataFrame([("y", "config parser error")], "id string, content string")
    ta = a.select(tokenize_normalized(F.col("content")).alias("t")).collect()[0]["t"]
    tb = b.select(tokenize_normalized(F.col("content")).alias("t")).collect()[0]["t"]
    assert ta == tb


# -------------------------------------------------------- A25 SQL surface


def test_sql_views_over_testdata(spark):
    from record_matching_spark.sources.views import register_testdata_views, sql

    names = register_testdata_views(spark, SF, tables=("nation", "region"))
    assert set(names) == {"nation", "region"}
    got = sql(spark, """
        SELECT r.r_name, count(*) AS n
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name
    """).collect()
    assert len(got) == 5 and sum(r["n"] for r in got) == 25


# ------------------------------------------- shingle-LSH dedup == brute force


def test_shingle_lsh_matches_bruteforce(spark):
    from record_matching_spark.functions.dedup import minhash_near_dup_pairs
    from record_matching_spark.operators.normalize import char_shingles

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    lsh = {
        (r["left"], r["right"])
        for r in minhash_near_dup_pairs(docs, threshold=0.9, shingle_k=8).collect()
    }
    sh = docs.select(
        "doc_id",
        F.array_sort(F.array_distinct(char_shingles(F.col("text"), 8))).alias("_t"),
    )
    a = sh.select(F.col("doc_id").alias("left"), F.col("_t").alias("_ta"))
    b = sh.select(F.col("doc_id").alias("right"), F.col("_t").alias("_tb"))
    union = F.size(F.array_union("_ta", "_tb"))
    brute = {
        (r["left"], r["right"])
        for r in a.crossJoin(b)
        .filter(F.col("left") < F.col("right"))
        .withColumn(
            "j",
            F.size(F.array_intersect("_ta", "_tb")).cast("double")
            / F.greatest(union, F.lit(1)),
        )
        .filter(F.col("j") >= 0.9)
        .collect()
    }
    assert lsh == brute


# ------------------------------ ADVICE: empty-token docs are not near-dups


def test_empty_token_docs_not_near_dups(spark):
    from record_matching_spark.functions.dedup import (
        minhash_near_dup_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "!!! ???"),          # tokenizes to empty
            (2, "$$$ %%%"),          # tokenizes to empty, different content
            (3, "!!! ???"),          # identical content to 1
            (4, "normal english words here"),
        ],
        "doc_id long, text string",
    )
    mh = {(r["left"], r["right"]) for r in
          minhash_near_dup_pairs(docs, threshold=0.9).collect()}
    assert (1, 3) in mh, "identical punctuation-only docs ARE duplicates"
    assert (1, 2) not in mh and (2, 3) not in mh, (
        "different empty-token docs are NOT duplicates")
    ng = {(r["left"], r["right"]) for r in
          ngram_jaccard_pairs(docs, threshold=0.9).collect()}
    assert (1, 3) in ng and (1, 2) not in ng


def test_empty_token_pairs_score_low(spark):
    from record_matching_spark.operators.normalize import normalize_files
    from record_matching_spark.operators.scoring import pair_features

    rows = [
        ("r0", "a.py", "c0", "python", "!!! ???"),
        ("r1", "b.py", "c1", "python", "$$$ %%%"),
    ]
    files = normalize_files(spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    ))
    ids = sorted(r["file_id"] for r in files.select("file_id").collect())
    pairs = spark.createDataFrame([tuple(ids)], "left string, right string")
    r = pair_features(pairs, files).collect()[0]
    assert r["jaccard"] == 0.0 and r["tfidf_cos"] == 0.0 and r["lev_sig"] == 0.0


# --------------------------------------------------------------- B19 RF CV


def test_random_forest_cv_and_threshold(spark):
    import random

    from record_matching_spark.operators.scoring import train_random_forest_cv

    rng = random.Random(7)
    rows = []
    for i in range(240):
        match = i % 2 == 0
        base = 0.85 if match else 0.25
        f = lambda: min(1.0, max(0.0, base + rng.uniform(-0.1, 0.1)))
        rows.append((f"l{i}", f"r{i}", f(), f(), f(), 0.5, 1.0, f(), 0.0, 0.0,
                     match))
    df = spark.createDataFrame(
        rows, "left string, right string, jaccard double, tfidf_cos double, "
              "lev_sig double, jw_path double, same_lang double, dir_sim double, "
              "any_empty double, both_empty double, match boolean")
    model, importances, tau, f1, auc = train_random_forest_cv(
        df, num_trees=20, folds=3)
    assert f1 > 0.95 and auc > 0.95
    assert 0.0 < tau < 1.0
    # the informative features carry the importance mass
    flat = importances["jw_path"] + importances["same_lang"]
    assert sum(importances.values()) == pytest.approx(1.0, abs=1e-6)
    assert flat < 0.2


def test_iceberg_ddl_recipe():
    from record_matching_spark.sources.io import iceberg_ddl

    ddl = iceberg_ddl("cat.db.t")
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS cat.db.t (")
    for col in ("repo STRING", "path STRING", "commit STRING",
                "lang STRING", "content STRING"):
        assert col in ddl
    assert "USING iceberg" in ddl and "PARTITIONED BY (lang, bucket(64, repo))" in ddl


# ------------------------------------------------------ A1/A4 CSV round-trip


def test_csv_roundtrip(spark, tmp_path):
    from record_matching_spark.sources.io import read_csv, write_csv

    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", -2.0)], "id long, name string, x double"
    )
    path = str(tmp_path / "csv_out")
    write_csv(df, path)
    back = read_csv(spark, path, schema="id long, name string, x double")
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}
