"""Per-phase isolation probes for the optimization round (guide §1.4).

NOT the driver bench — bench.py stays frozen. This file times individual
phases of the hot queries with the noop sink and labeled jobs so the
spark_optimization_guide §1 loop (measure → change → re-measure) has
per-operator numbers. Results are cited in OPTIMIZATION_r06.md.

Usage: python bench_extra.py [phase ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from record_matching_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark(app_name="rmspark-bench-extra")
    sc = spark.sparkContext
    out: dict[str, float] = {}

    def probe(name: str, fn, reps: int = 2) -> None:
        if only and not any(name.startswith(o) for o in only):
            return
        best = float("inf")
        for _ in range(reps):
            spark.catalog.clearCache()
            sc.setJobDescription(name)
            t0 = time.monotonic()
            fn()
            best = min(best, time.monotonic() - t0)
        out[name] = round(best, 3)
        print(f"[probe] {name}: {best:.3f}s  loadavg={os.getloadavg()[0]:.1f}",
              flush=True)
        sc.setJobDescription(None)

    docs = lambda: spark.read.parquet(f"{SF_DIR}/documents.parquet")  # noqa: E731

    # ---- q20 phases ------------------------------------------------------
    from record_matching_spark.functions.dedup import minhash_near_dup_pairs
    from record_matching_spark.operators.minhash import with_minhash_signature
    from record_matching_spark.operators.normalize import char_shingles, tokenize

    def q20_sigs():
        d = docs()
        toks = d.select(
            F.col("doc_id").alias("_id"),
            F.array_sort(F.array_distinct(tokenize(F.col("text")))).alias("_t"),
        )
        _noop(with_minhash_signature(toks, tokens_col="_t", uniq_col="_id"))

    def q19_sigs():
        d = docs()
        toks = d.select(
            F.col("doc_id").alias("_id"),
            F.array_sort(
                F.array_distinct(char_shingles(F.col("text"), 8))
            ).alias("_t"),
        )
        _noop(with_minhash_signature(toks, tokens_col="_t", uniq_col="_id"))

    def q20_pairs_only():
        _noop(minhash_near_dup_pairs(docs(), threshold=0.9, verify_exact=False))

    def q19_pairs_only():
        _noop(
            minhash_near_dup_pairs(
                docs(), threshold=0.9, shingle_k=8, verify_exact=False
            )
        )

    def q20_full():
        _noop(minhash_near_dup_pairs(docs(), threshold=0.9))

    def q19_full():
        _noop(minhash_near_dup_pairs(docs(), threshold=0.9, shingle_k=8))

    probe("q20_sigs", q20_sigs)
    probe("q20_pairs_only", q20_pairs_only)
    probe("q20_full", q20_full)
    probe("q19_sigs", q19_sigs)
    probe("q19_pairs_only", q19_pairs_only)
    probe("q19_full", q19_full)

    # ---- q21 phases ------------------------------------------------------
    from pyspark.sql import Window as W

    from record_matching_spark.operators.cluster import cluster_assignments

    def q21_edges():
        d = docs()
        w = W.partitionBy("lang", "source").orderBy("doc_id")
        _noop(
            d.select("lang", "source", "doc_id")
            .withColumn("prev", F.lag("doc_id").over(w))
            .filter(F.col("prev").isNotNull())
            .select(F.col("prev").alias("src"), F.col("doc_id").alias("dst"))
        )

    def q21_full():
        d = docs()
        w = W.partitionBy("lang", "source").orderBy("doc_id")
        edges = (
            d.select("lang", "source", "doc_id")
            .withColumn("prev", F.lag("doc_id").over(w))
            .filter(F.col("prev").isNotNull())
            .select(F.col("prev").alias("src"), F.col("doc_id").alias("dst"))
        )
        _noop(cluster_assignments(edges, d, "doc_id"))

    probe("q21_edges", q21_edges)
    probe("q21_full", q21_full)

    # ---- q05 / q22 -------------------------------------------------------
    def q05_full():
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        a = li.select(F.col("l_orderkey").alias("okey"), F.col("l_linenumber").alias("la"))
        b = li.select(F.col("l_orderkey").alias("okey"), F.col("l_linenumber").alias("lb"))
        _noop(a.join(b, "okey").filter(F.col("la") < F.col("lb")).select("okey", "la", "lb"))

    def q22_full():
        from record_matching_spark.functions.similarity import cosine_topk_tiled

        e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        _noop(cosine_topk_tiled(e, e, k=3, id_col="vec_id", vec_col="embedding"))

    probe("q05_full", q05_full)
    probe("q22_full", q22_full)

    # ---- ER section phases ----------------------------------------------
    from record_matching_spark.operators.blocking import blocking_keys, candidate_pairs
    from record_matching_spark.operators.normalize import normalize_files
    from record_matching_spark.operators.scoring import (
        pair_features,
        score_pairs,
        sha_features,
    )

    corpus_path = "/tmp/rmspark_bench/corpus_f4000_s42_m4_h2"
    if os.path.exists(os.path.join(corpus_path, "_SUCCESS")) and (
        not only or any(o.startswith("er") for o in only)
    ):
        files = spark.read.parquet(corpus_path).select(
            "repo", "path", "commit", "lang", "content"
        ).cache()
        files.count()
        norm = normalize_files(files).cache()
        norm.count()

        def er_blocking():
            _noop(
                candidate_pairs(
                    blocking_keys(norm, id_col="fid"), id_col="fid", salt_cap=1000
                )
            )

        probe("er_blocking", er_blocking)

        pairs = candidate_pairs(
            blocking_keys(norm, id_col="fid"), id_col="fid", salt_cap=1000
        ).cache()
        pairs.count()

        def er_shaf():
            _noop(sha_features(norm))

        def er_scoring():
            _noop(score_pairs(pair_features(pairs, norm, id_col="fid")))

        probe("er_shaf", er_shaf)
        probe("er_scoring", er_scoring)

    print(json.dumps({"probes": out, "sf_dir": SF_DIR}))


if __name__ == "__main__":
    main()
