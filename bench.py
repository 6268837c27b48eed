"""Benchmark harness — prints ONE JSON line per the driver contract.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the ER pipeline
over a deterministic synthetic repo_files corpus sized to the SF.

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

# synthetic ER corpus sized to SF: sf0.1 → ~1500 families ≈ 18k files
ER_FAMILIES = max(100, int(15000 * SF))


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="rmspark-bench")
    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    import __spark_entry__ as em

    qs = em.queries()

    def run(name: str, fn) -> None:
        t0 = time.monotonic()
        fn()
        timings[name] = round(time.monotonic() - t0, 3)

    # --- ER pipeline on synthetic corpus (the flagship workload) ---------
    from record_matching_spark.operators.blocking import blocking_keys, candidate_pairs
    from record_matching_spark.operators.cluster import cluster_assignments
    from record_matching_spark.operators.normalize import normalize_files
    from record_matching_spark.operators.scoring import pair_features, score_pairs
    from record_matching_spark.synth import repo_files, synth_repo_files_with_truth

    truth = synth_repo_files_with_truth(
        spark, n_families=ER_FAMILIES, seed=42, members_mean=4, heavy_families=2
    )
    files = repo_files(truth).cache()
    n_files = files.count()  # generation excluded from pipeline timing
    extra["er_files"] = n_files

    norm = normalize_files(files).cache()
    norm.count()

    t0 = time.monotonic()
    pairs = candidate_pairs(
        blocking_keys(norm, id_col="fid"), id_col="fid", salt_cap=1000
    ).cache()
    n_pairs = pairs.count()
    timings["er_blocking_pairs"] = round(time.monotonic() - t0, 3)
    extra["er_candidate_pairs"] = n_pairs

    t0 = time.monotonic()
    scored = score_pairs(pair_features(pairs, norm, id_col="fid")).cache()
    scored.count()
    t_score = time.monotonic() - t0
    timings["er_pair_scoring"] = round(t_score, 3)
    extra["pairs_scored_per_sec"] = round(n_pairs / max(t_score, 1e-9), 1)

    t0 = time.monotonic()
    edges = scored.filter(F.col("score") > 0.5).select(
        F.col("left").alias("src"), F.col("right").alias("dst")
    )
    assign = cluster_assignments(edges, norm, "fid")
    _materialize(
        assign.join(norm.select("fid", "file_id"), "fid").select("file_id", "cluster_id")
    )
    timings["er_clustering"] = round(time.monotonic() - t0, 3)
    # hard isolation: the ER section leaves 32 python UDF workers with
    # grown heaps plus shuffle state; restart the session so the headline
    # queries measure the engine, not the residue (measured: q20 takes
    # 33s in a fresh session vs 70-220s in the polluted one)
    spark.stop()
    spark = get_spark(app_name="rmspark-bench-queries")

    # --- headline testdata queries ---------------------------------------
    for name in [
        "q01_pricing_summary",
        "q05_lineitem_pairs",
        "q06_top_orders_per_cust",
        "q20_minhash_dedup",
        "q21_cc_groups",
        "q22_embedding_topk",
    ]:
        run(name, lambda n=name: _materialize(qs[n](spark, SF_DIR)))

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
