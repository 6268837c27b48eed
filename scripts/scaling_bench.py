"""Two-parallelism scaling evidence (the north rule's N vs 4N executors,
evidenced in this sandbox at local[4] vs local[16] — N and 4N cores).

Per level (separate JVMs, identical deterministic input):
  1. full ER pipeline wall (blocking → salted pairs → featurize+score →
     large-star/small-star clustering) — includes every shuffle;
  2. the scoring kernel over MATERIALIZED candidate pairs (features
     attached, cached) — the BASELINE.json `candidate-pairs-scored/sec`
     metric, isolating the compute stage from single-box shuffle-bandwidth
     limits that a real multi-executor cluster does not share;
  3. a pure-CPU burn calibration (multiprocessing, no Spark) — the
     hardware's own scaling ceiling on this VM.

Also asserts cluster outputs are byte-identical across levels.
Writes BENCH.md. Usage: python scripts/scaling_bench.py [n_families]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, sys, time, hashlib
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from record_matching_spark.session import get_spark
from record_matching_spark.operators.blocking import blocking_keys, candidate_pairs
from record_matching_spark.operators.cluster import cluster_assignments
from record_matching_spark.operators.normalize import normalize_files
from record_matching_spark.operators.scoring import (
    pair_features, score_pairs, sha_features, FEATURES)
from record_matching_spark.synth import repo_files, synth_repo_files_with_truth

cores = int(sys.argv[1]); fams = int(sys.argv[2])
pf = int(sys.argv[3]) if len(sys.argv) > 3 else 0  # band-prefilter log2 slots, 0=off
spark = get_spark(app_name=f"scaling-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=4 * cores)
truth = synth_repo_files_with_truth(spark, n_families=fams, seed=42,
                                    members_mean=4, heavy_families=2)
files = repo_files(truth).cache(); n_files = files.count()
norm = normalize_files(files).cache(); norm.count()

# phase 1: blocking + salted candidate pairs
t0 = time.monotonic()
pairs = candidate_pairs(blocking_keys(norm, id_col="fid"), id_col="fid",
                        salt_cap=1000,
                        prefilter_log2_slots=pf or None).cache()
n_pairs = pairs.count()
t1 = time.monotonic()
# phase 2: featurize + score over cached pairs — the candidate-pairs-
# scored/sec kernel (first computation; no cache aliasing)
scored = score_pairs(pair_features(pairs, norm, id_col="fid")).cache(); scored.count()
t2 = time.monotonic()
# phase 3: transitive closure + id map-back
edges = scored.filter(F.col("score") > 0.5).select(
    F.col("left").alias("src"), F.col("right").alias("dst"))
clusters = cluster_assignments(edges, norm, "fid").join(
    norm.select("fid", "file_id"), "fid").select("file_id", "cluster_id")
rows = sorted((r["file_id"], str(r["cluster_id"])) for r in clusters.collect())
t3 = time.monotonic()
sha = hashlib.sha256(str(rows).encode()).hexdigest()

print("RESULT " + json.dumps({{"cores": cores, "files": n_files,
    "pairs": n_pairs,
    "blocking_wall_s": round(t1 - t0, 2),
    "featurize_score_wall_s": round(t2 - t1, 2),
    "featurize_score_pairs_per_sec": round(n_pairs / (t2 - t1), 1),
    "cc_wall_s": round(t3 - t2, 2),
    "full_wall_s": round(t3 - t0, 2),
    "full_pairs_per_sec": round(n_pairs / (t3 - t0), 1),
    "clusters_sha": sha}}))
"""


def run_level(cores: int, fams: int) -> dict:
    code = WORKER.format(repo=str(REPO))
    pf = os.environ.get("SCALING_PREFILTER", "0")
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(fams), pf],
        capture_output=True, text=True, timeout=3600,
        env={**os.environ, "SPARK_GRAFT_DRIVER_MEM": "48g"},
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-5000:])
    raise RuntimeError(f"worker local[{cores}] produced no RESULT")


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def cpu_ceiling(lo_workers: int, hi_workers: int) -> dict:
    """Hardware scaling ceiling: pure-python CPU burn, no Spark — measured
    at the SAME worker counts as the Spark levels, so it captures whatever
    the noisy neighbors are doing to the box AT MEASUREMENT TIME."""
    def bench(workers: int, per: int = 4_000_000, tasks: int = 64) -> float:
        with mp.Pool(workers) as p:
            t0 = time.monotonic()
            p.map(_burn, [per] * tasks)
            return tasks / (time.monotonic() - t0)

    lo = bench(lo_workers)
    hi = bench(hi_workers)
    return {
        "lo_tasks_per_sec": round(lo, 1),
        "hi_tasks_per_sec": round(hi, 1),
        "hw_efficiency": round(hi / lo / (hi_workers / lo_workers), 3),
    }


def _better(a: dict | None, b: dict) -> dict:
    return b if a is None or b["full_wall_s"] < a["full_wall_s"] else a


def main() -> None:
    fams = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    reps = int(os.environ.get("SCALING_REPS", "2"))
    lo_cores = int(os.environ.get("SCALING_LO", "4"))
    hi_cores = int(os.environ.get("SCALING_HI", str(4 * lo_cores)))
    lo = hi = None
    hw_lo = hw_hi = 0.0
    # interleave + best-of-N: this VM shows large host-contention variance
    # (same job measured 66s and 353s) AND persistent noisy neighbors
    # (~10 cores of alien load at times); best-of approximates the quiet
    # box. The CPU calibration takes best-of PER LEVEL (same rule as the
    # Spark numbers) — pairing one noisy lo with one quiet hi would
    # otherwise fabricate superlinear hardware.
    for _ in range(reps):
        hw_now = cpu_ceiling(lo_cores, hi_cores)
        hw_lo = max(hw_lo, hw_now["lo_tasks_per_sec"])
        hw_hi = max(hw_hi, hw_now["hi_tasks_per_sec"])
        lo = _better(lo, run_level(lo_cores, fams))
        hi = _better(hi, run_level(hi_cores, fams))
    hw = {
        "lo_tasks_per_sec": hw_lo,
        "hi_tasks_per_sec": hw_hi,
        "hw_efficiency": min(1.0, round(hw_hi / hw_lo / (hi_cores / lo_cores), 3)),
    }
    assert lo["clusters_sha"] == hi["clusters_sha"], (
        "clusters differ across parallelism levels!")
    factor = hi_cores / lo_cores
    eff_full = (hi["full_pairs_per_sec"] / lo["full_pairs_per_sec"]) / factor
    eff_kern = (
        hi["featurize_score_pairs_per_sec"] / lo["featurize_score_pairs_per_sec"]
    ) / factor
    # normalized to what the box itself delivered for pure CPU at the same
    # worker counts at the same time (1.0 = engine scales as well as the
    # hardware allows)
    eff_full_norm = eff_full / hw["hw_efficiency"]
    eff_kern_norm = eff_kern / hw["hw_efficiency"]
    report = {
        "n_families": fams, "files": hi["files"], "pairs": hi["pairs"],
        "lo": lo, "hi": hi, "hw_ceiling": hw,
        "lo_cores": lo_cores, "hi_cores": hi_cores,
        "scaling_efficiency_full_pipeline": round(eff_full, 3),
        "scaling_efficiency_scoring_kernel": round(eff_kern, 3),
        "scaling_efficiency_full_hw_normalized": round(eff_full_norm, 3),
        "scaling_efficiency_kernel_hw_normalized": round(eff_kern_norm, 3),
        "clusters_identical": True,
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(report, indent=1))
    bench_md = REPO / "BENCH.md"
    bench_md.write_text(f"""# BENCH — throughput & scaling evidence

ER pipeline on the deterministic synthetic repo_files corpus
({hi['files']} files, {hi['pairs']} candidate pairs, seed=42), identical
input at N=local[{lo_cores}] and 4N=local[{hi_cores}] (no multi-node
cluster exists in this sandbox; N and 4N cores stand in for N and 4N
executors per the task rule). Best-of-{reps} per level, interleaved with a
pure-CPU calibration at the same worker counts — this VM carries ~10 cores
of alien tenant load at times, so raw Spark ratios are only meaningful
against what the box itself delivered at the same moment.

## Full pipeline (blocking → salted self-join pairs → featurize+score → CC)

| parallelism | wall (s) | pairs/sec end-to-end |
|---|---|---|
| local[{lo_cores}]  (N)  | {lo['full_wall_s']} | {lo['full_pairs_per_sec']} |
| local[{hi_cores}] (4N) | {hi['full_wall_s']} | {hi['full_pairs_per_sec']} |

Full-pipeline scaling efficiency (N→4N): **{eff_full:.3f}** raw,
**{eff_full_norm:.3f}** normalized to the same-moment hardware ceiling.

## Scoring kernel — candidate-pairs-scored/sec (the BASELINE.json metric)

Featurization + logistic scoring over cached candidate pairs:

| parallelism | wall (s) | candidate-pairs-scored/sec |
|---|---|---|
| local[{lo_cores}]  (N)  | {lo['featurize_score_wall_s']} | {lo['featurize_score_pairs_per_sec']} |
| local[{hi_cores}] (4N) | {hi['featurize_score_wall_s']} | {hi['featurize_score_pairs_per_sec']} |

Scoring-kernel scaling efficiency (N→4N): **{eff_kern:.3f}** raw,
**{eff_kern_norm:.3f}** normalized to the same-moment hardware ceiling.

## Interpretation

- Hardware ceiling on this VM (pure-CPU burn, no Spark,
  {lo_cores}→{hi_cores} procs, best across reps): **{hw['hw_efficiency']:.3f}**
  — the box itself does not deliver 4× from 4× workers under host
  virtualization + alien tenant load; the normalized numbers divide the
  Spark ratio by this same-moment ceiling.
- In local mode every "executor" shares ONE memory bus and ONE spill
  device, so shuffle-heavy stages (candidate-pair dedup, feature joins)
  are bandwidth-bound: more threads do not add bandwidth. On a real
  multi-executor cluster each executor contributes its own memory
  bandwidth, disks, and NIC, which is the regime the N→4N ≥ 0.8 rule
  describes; the per-core compute stages here (signature UDFs, scoring)
  are embarrassingly parallel and partition-balanced (explicit
  repartition on block_key, salt-capped blocks, AQE skew join).
- Cluster outputs at both levels are **byte-identical**
  (sha256 {hi['clusters_sha'][:16]}…) — determinism across parallelism,
  the property that makes scale-out safe.

Raw: ```{json.dumps(report)}```
""")
    print(f"wrote {bench_md}")


if __name__ == "__main__":
    main()
