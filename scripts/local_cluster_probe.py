"""Stretch evidence (VERDICT r2 item 9): run the ER pipeline under
`local-cluster[N,2,mem]` — Spark's testing master that spawns REAL worker
JVMs with separate executor processes, heaps, and shuffle servers — at one
2-core executor vs four separate 2-core executor JVMs (N vs 4N EXECUTORS,
2→8 total cores: the same core envelope as the main scaling bench, so the
two measurements differ only in the executor process model).

Still one physical box (shared memory bus / disk), so this is NOT a
cluster measurement; it is the closest this sandbox gets to one: separate
JVM heaps, real netty shuffle between processes, real serialization. If
the sandbox cannot start worker JVMs the attempt itself is the documented
result.

Usage: python scripts/local_cluster_probe.py [n_families=6000] [reps=2]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, sys, time, hashlib
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from record_matching_spark.operators.blocking import blocking_keys, candidate_pairs
from record_matching_spark.operators.cluster import cluster_assignments
from record_matching_spark.operators.normalize import normalize_files
from record_matching_spark.operators.scoring import pair_features, score_pairs
from record_matching_spark.synth import repo_files, synth_repo_files_with_truth

master = sys.argv[1]; fams = int(sys.argv[2]); shuffle = int(sys.argv[3])
spark = (
    SparkSession.builder.master(master)
    .appName("local-cluster-probe")
    .config("spark.sql.shuffle.partitions", str(shuffle))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "8g")
    .config("spark.local.dir", "/tmp/spark_lc")
    # executors are SEPARATE processes here (unlike local[N]) and do not
    # inherit the driver's sys.path — ship the package location explicitly
    .config("spark.executorEnv.PYTHONPATH", {repo!r})
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
truth = synth_repo_files_with_truth(spark, n_families=fams, seed=42,
                                    members_mean=4, heavy_families=2)
files = repo_files(truth).cache(); n_files = files.count()
norm = normalize_files(files).cache(); norm.count()
t0 = time.monotonic()
pairs = candidate_pairs(blocking_keys(norm, id_col="fid"), id_col="fid",
                        salt_cap=1000).cache()
n_pairs = pairs.count()
scored = score_pairs(pair_features(pairs, norm, id_col="fid")).cache(); scored.count()
edges = scored.filter(F.col("score") > 0.5).select(
    F.col("left").alias("src"), F.col("right").alias("dst"))
clusters = cluster_assignments(edges, norm, "fid").join(
    norm.select("fid", "file_id"), "fid").select("file_id", "cluster_id")
rows = sorted((r["file_id"], str(r["cluster_id"])) for r in clusters.collect())
t1 = time.monotonic()
sha = hashlib.sha256(str(rows).encode()).hexdigest()
print("RESULT " + json.dumps({{"master": master, "files": n_files,
    "pairs": n_pairs, "wall_s": round(t1 - t0, 2),
    "pairs_per_sec": round(n_pairs / (t1 - t0), 1), "sha": sha}}))
spark.stop()
"""


def run(master: str, fams: int, shuffle: int) -> dict:
    code = WORKER.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", code, master, str(fams), str(shuffle)],
        capture_output=True, text=True, timeout=3600, env=dict(os.environ),
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
    raise RuntimeError(f"worker {master} produced no RESULT")


def main() -> None:
    fams = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    lo_master = "local-cluster[1,2,6144]"
    hi_master = "local-cluster[4,2,6144]"
    try:
        smoke = run("local-cluster[2,2,2048]", 200, 8)
        print(f"smoke ok: {smoke}", flush=True)
    except Exception as exc:
        print(f"LOCAL_CLUSTER_UNAVAILABLE: {exc}", flush=True)
        return
    lo = hi = None
    for rep in range(reps):
        a = run(lo_master, fams, 8)
        b = run(hi_master, fams, 32)
        print(f"rep{rep}: lo={a['wall_s']}s hi={b['wall_s']}s", flush=True)
        lo = a if lo is None or a["wall_s"] < lo["wall_s"] else lo
        hi = b if hi is None or b["wall_s"] < hi["wall_s"] else hi
    assert lo["sha"] == hi["sha"], "clusters differ across executor counts"
    eff = (hi["pairs_per_sec"] / lo["pairs_per_sec"]) / 4.0
    print(json.dumps({
        "files": lo["files"], "pairs": lo["pairs"],
        "lo": lo, "hi": hi,
        "executors_1_to_4_efficiency": round(eff, 3),
        "clusters_identical": True,
    }, indent=1), flush=True)


if __name__ == "__main__":
    main()
