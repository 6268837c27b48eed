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
  extra.loadavg, every rep's raw time in extra.reps, and a single-thread
  fixed-work CPU calibration (extra.calib_ms) runs before each section —
  1-min loadavg decays too slowly to tell our own just-finished burst from
  alien tenant load (both the 15.7s and 141.3s q20 samples launched at
  loadavg ~22-24), but the same-moment probe inflates only under real
  contention. This is the evidence that adjudicated the r4 q20 sample.

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
    calibs: dict[str, float] = {}
    all_reps: dict[str, list] = {}

    def _calibrate(tag: str) -> None:
        """Same-moment contention probes, one per dimension the host
        steals: a cache-resident CPU probe and a streaming MEMBW probe.
        1-min loadavg decays too slowly to separate our own just-finished
        burst from alien load (both the 15.7s and 141.3s q20 samples
        launched at loadavg ~22-24). NO point probe fully discriminates
        the slow mode (a 101s q20 ran between two quiet membw reads, and
        in-run membw sampling stayed at p50 <10ms while q20 crawled at
        39-55s) — but the probes DO catch the gross episodes (the
        oversized first cut drifted 9.5→17.5s across one contended run),
        and the r3-vs-today absolute CPU-burn ledger (10.9 vs 8.8 tasks/s
        per 2 workers) shows the box spends daytime at ~0.8× its overnight
        capacity. The reliable signal is identical-job rep variance, which
        is why every rep's raw wall time is now in extra.reps."""
        import numpy as np

        a = np.random.RandomState(0).rand(1_250_000)  # 10 MB, ~L3-resident
        (a * a).sum()  # warm pages before timing
        t0 = time.perf_counter()
        for _ in range(40):
            (a * a).sum()
        calibs[tag] = round((time.perf_counter() - t0) * 1e3, 1)  # ~75ms quiet
        big = np.random.RandomState(1).rand(18_750_000)  # 150 MB, streams
        big.sum()
        t0 = time.perf_counter()
        for _ in range(3):
            big.sum()
        calibs[tag + "_membw"] = round((time.perf_counter() - t0) * 1e3, 1)

    _calibrate("er_section")
    reps = []
    for _ in range(REPS):
        la = os.getloadavg()[0]
        r = er_rep()
        r["_loadavg"] = round(la, 2)
        reps.append(r)
    loadavgs["er_section"] = reps[0]["_loadavg"]
    # per-stage independent best-of: the stages are separate measurements,
    # and picking one "best rep" by scoring time let a warmup-rep blocking
    # number (11.1s vs 4.5s warm) masquerade as a regression
    best = {
        k: min(r[k] for r in reps)
        for k in ("er_blocking_pairs", "er_pair_scoring", "er_clustering")
    }
    extra["er_files"] = reps[0]["er_files"]
    extra["er_candidate_pairs"] = reps[0]["er_candidate_pairs"]
    for k, v in best.items():
        timings[k] = round(v, 3)
    all_reps["er"] = [
        {k: round(r[k], 3) for k in (*best, "_loadavg")} for r in reps
    ]
    extra["pairs_scored_per_sec"] = round(
        extra["er_candidate_pairs"] / max(best["er_pair_scoring"], 1e-9), 1
    )

    # hard isolation: the ER section leaves 32 python UDF workers with
    # grown heaps plus shuffle state; restart the session so the headline
    # queries measure the engine, not the residue (measured: q20 takes
    # 33s in a fresh session vs 70-220s in the polluted one)
    spark.stop()
    spark = get_spark(app_name="rmspark-bench-queries")

    def run_best_of(spark, name: str) -> None:
        best_t = float("inf")
        rep_ts = []
        for _ in range(REPS):
            spark.catalog.clearCache()
            la = os.getloadavg()[0]
            t0 = time.monotonic()
            _materialize(qs[name](spark, SF_DIR))
            dt = time.monotonic() - t0
            rep_ts.append(round(dt, 3))
            if dt < best_t:
                best_t = dt
                loadavgs[name] = round(la, 2)
        timings[name] = round(best_t, 3)
        all_reps[name] = rep_ts

    # --- headline testdata queries (best-of-REPS each) --------------------
    _calibrate("headline_section")
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
    _calibrate("dedup_section")
    for name in ["q19_shingle_dedup", "q20_minhash_dedup"]:
        run_best_of(spark, name)
    _calibrate("end")

    extra["loadavg"] = loadavgs
    extra["calib_ms"] = calibs
    extra["reps"] = all_reps
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
