"""CC round-cost A/B: round-2 implementation (groupBy+join stars + separate
fingerprint pass) vs round-3 (window stars + observe-folded fingerprint).

VERDICT r2 item 2 'done' criterion: identical cluster assignments (SHA) on
the same edge set, with measurably lower cc wall time, best-of-N with the
two variants alternated so the noisy-VM drift hits both equally.

The round-2 module is pulled from git history at runtime
(`git show <commit>^:...cluster.py`) so the comparison is against the real
shipped code, not a re-implementation.

Edge set: deterministic synthetic component structure — 60k chain/star
families of mean size 6 plus 3 mega-components of 30k nodes each (~400k
edges, ~420k nodes), the shape the ER pipeline feeds CC (many small
clusters, a few pathological ones that need the full O(log n) rounds).

Usage: python scripts/cc_ab_bench.py [reps=3]
Prints a markdown row per rep + the best-of summary for BENCH.md.
"""

from __future__ import annotations

import hashlib
import importlib.util
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

R2_COMMIT = "27f182d"  # round-3 rework commit; parent carries the r2 code


def load_r2_module():
    src = subprocess.run(
        ["git", "-C", "/root/repo", "show",
         f"{R2_COMMIT}^:record_matching_spark/operators/cluster.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    path = "/tmp/cluster_r2_ab.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("cluster_r2_ab", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def synth_edges(spark: SparkSession):
    """Deterministic edge set: families as chains off a per-family base id,
    plus mega-components as long chains (worst-case round count)."""
    fam = spark.range(0, 60_000).select(
        F.explode(F.sequence(F.lit(0), (F.xxhash64("id") % 9 + 1).cast("int")))
        .alias("k"),
        (F.col("id") * 1000).alias("base"),
    )
    small = fam.select(
        (F.col("base") + F.col("k")).alias("src"),
        (F.col("base") + F.col("k") + 1).alias("dst"),
    )
    mega = spark.range(0, 3).select(
        F.explode(F.sequence(F.lit(0), F.lit(29_999))).alias("k"),
        (F.lit(10_000_000_000) + F.col("id") * 1_000_000).alias("base"),
    ).select(
        (F.col("base") + F.col("k")).alias("src"),
        (F.col("base") + F.col("k") + 1).alias("dst"),
    )
    return small.unionByName(mega).repartition(32).localCheckpoint(eager=True)


def assignments_sha(df) -> str:
    rows = df.select(
        F.xxhash64("node", "component").cast("decimal(38,0)").alias("h")
    ).agg(F.sum("h").alias("s"), F.count(F.lit(1)).alias("n")).collect()[0]
    return hashlib.sha256(f"{rows['s']}|{rows['n']}".encode()).hexdigest()[:16]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("cc_ab")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import record_matching_spark.operators.cluster as r3

    r2 = load_r2_module()
    edges = synth_edges(spark)
    n_edges = edges.count()
    print(f"edges={n_edges}", flush=True)

    results = {"r2": [], "r3": []}
    shas = {}
    for rep in range(reps):
        for name, mod in (("r2", r2), ("r3", r3)):
            t0 = time.monotonic()
            cc = mod.connected_components(edges)
            sha = assignments_sha(cc)
            dt = time.monotonic() - t0
            results[name].append(dt)
            shas.setdefault(name, sha)
            assert shas[name] == sha, f"{name} nondeterministic"
            print(f"rep{rep} {name}: {dt:.2f}s sha={sha}", flush=True)
    assert shas["r2"] == shas["r3"], f"assignment mismatch: {shas}"
    b2, b3 = min(results["r2"]), min(results["r3"])
    print(
        f"\n| CC A/B ({n_edges} edges, best-of-{reps}, alternated) "
        f"| r2 stars {b2:.2f}s | r3 stars {b3:.2f}s | "
        f"speedup {b2 / b3:.2f}x | SHAs identical |",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
