"""Benchmark harness — prints ONE JSON line per the driver contract.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the ER pipeline
over a deterministic synthetic repo_files corpus sized to the SF.

Protocol (round-2 hardening per VERDICT):
- best-of-N (default N=2, $SPARK_GRAFT_BENCH_REPS) per measurement — this
  VM's host-contention variance is extreme (same job measured 66s and 353s);
  best-of approximates the quiet box.
- the synthetic ER corpus is generated once and cached as parquet under
  /tmp keyed by its parameters, so corpus generation never pollutes timings.
- the Spark session restarts between the ER section and the headline
  queries (grown Python UDF workers + shuffle residue otherwise taxes the
  later queries), and AGAIN before the q19/q20 dedup pair (VERDICT r4
  item 1: their samples were bimodal under residue + tenant load, so they
  get their own session like the ER section).
- the 1-min loadavg at the launch of each query's best rep is recorded in
  extra.loadavg — the same-moment contention evidence that adjudicated the
  r4 q20 sample.

Every query is forced through the noop sink (full materialization, no
column-pruning escape hatch). `value` = total seconds across queries.
Extra fields report candidate-pairs-scored/sec for the ER pipeline — the
BASELINE.json throughput metric.
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
# sf encoded in the dir name, e.g. .../sf0.1
try:
    SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[1])
except (IndexError, ValueError):
    SF = 0.1

# synthetic ER corpus sized to SF: sf0.1 → 4000 families ≈ 32k files /
# ~2.5M candidate pairs — big enough that pairs-scored/sec measures the
# scoring kernel rather than fixed per-stage overhead (generation itself is
# cached as parquet and excluded from timings)
ER_FAMILIES = max(100, int(40000 * SF))
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _corpus_path() -> str:
    return f"/tmp/rmspark_bench/corpus_f{ER_FAMILIES}_s42_m4_h2"


def _ensure_corpus(spark) -> None:
    path = _corpus_path()
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    from record_matching_spark.synth import synth_repo_files_with_truth

    truth = synth_repo_files_with_truth(
        spark, n_families=ER_FAMILIES, seed=42, members_mean=4, heavy_families=2
    )
    truth.write.mode("overwrite").parquet(path)


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="rmspark-bench")
    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    import __spark_entry__ as em

    qs = em.queries()

    # --- ER pipeline on synthetic corpus (the flagship workload) ---------
    from record_matching_spark.operators.blocking import blocking_keys, candidate_pairs
    from record_matching_spark.operators.cluster import cluster_assignments
    from record_matching_spark.operators.normalize import normalize_files
    from record_matching_spark.operators.scoring import pair_features, score_pairs

    _ensure_corpus(spark)

    def er_rep() -> dict[str, float]:
        spark.catalog.clearCache()
        files = spark.read.parquet(_corpus_path()).select(
            "repo", "path", "commit", "lang", "content"
        ).cache()
        n_files = files.count()
        norm = normalize_files(files).cache()
        norm.count()
        t: dict[str, float] = {"er_files": n_files}

        t0 = time.monotonic()
        pairs = candidate_pairs(
            blocking_keys(norm, id_col="fid"), id_col="fid", salt_cap=1000
        ).cache()
        n_pairs = pairs.count()
        t["er_blocking_pairs"] = time.monotonic() - t0
        t["er_candidate_pairs"] = n_pairs

        t0 = time.monotonic()
        scored = score_pairs(pair_features(pairs, norm, id_col="fid")).cache()
        scored.count()
        t["er_pair_scoring"] = time.monotonic() - t0

        t0 = time.monotonic()
        edges = scored.filter(F.col("score") > 0.5).select(
            F.col("left").alias("src"), F.col("right").alias("dst")
        )
        assign = cluster_assignments(edges, norm, "fid")
        _materialize(
            assign.join(norm.select("fid", "file_id"), "fid").select(
                "file_id", "cluster_id"
            )
        )
        t["er_clustering"] = time.monotonic() - t0
        return t

    loadavgs: dict[str, float] = {}

    best = None
    for _ in range(REPS):
        la = os.getloadavg()[0]
        r = er_rep()
        if best is None or r["er_pair_scoring"] < best["er_pair_scoring"]:
            best = r
            loadavgs["er_section"] = round(la, 2)
    extra["er_files"] = best["er_files"]
    extra["er_candidate_pairs"] = best["er_candidate_pairs"]
    for k in ("er_blocking_pairs", "er_pair_scoring", "er_clustering"):
        timings[k] = round(best[k], 3)
    extra["pairs_scored_per_sec"] = round(
        best["er_candidate_pairs"] / max(best["er_pair_scoring"], 1e-9), 1
    )

    # hard isolation: the ER section leaves 32 python UDF workers with
    # grown heaps plus shuffle state; restart the session so the headline
    # queries measure the engine, not the residue (measured: q20 takes
    # 33s in a fresh session vs 70-220s in the polluted one)
    spark.stop()
    spark = get_spark(app_name="rmspark-bench-queries")

    def run_best_of(spark, name: str) -> None:
        best_t = float("inf")
        for _ in range(REPS):
            spark.catalog.clearCache()
            la = os.getloadavg()[0]
            t0 = time.monotonic()
            _materialize(qs[name](spark, SF_DIR))
            dt = time.monotonic() - t0
            if dt < best_t:
                best_t = dt
                loadavgs[name] = round(la, 2)
        timings[name] = round(best_t, 3)

    # --- headline testdata queries (best-of-REPS each) --------------------
    for name in [
        "q01_pricing_summary",
        "q05_lineitem_pairs",
        "q06_top_orders_per_cust",
        "q21_cc_groups",
        "q22_embedding_topk",
    ]:
        run_best_of(spark, name)

    # q19/q20 in their OWN fresh session (VERDICT r4 item 1): the dedup
    # pair is the most residue-sensitive measurement in the suite
    spark.stop()
    spark = get_spark(app_name="rmspark-bench-dedup")
    for name in ["q19_shingle_dedup", "q20_minhash_dedup"]:
        run_best_of(spark, name)

    extra["loadavg"] = loadavgs
    out = {
        "metric": "total_bench_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF,
        "extra": extra,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
