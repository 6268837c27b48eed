"""A/B: embedding_near_dup_pairs_lsh (hyperplane buckets + exact verify)
vs the brute-force cartesian arm (VERDICT r4 item 4 done-criterion).
Reports wall time per arm (best-of-N fresh-plan reps), pair counts, and
recall of the LSH arm vs brute force.

Usage: python scripts/embed_lsh_ab.py [sf_dir|synth] [threshold]
Default arg is `synth`: a deterministic planted-cluster corpus (4000
64-dim vectors in ~1200 tight clusters) — the sf embeddings table has NO
pairs above cosine 0.9 (measured: 0 at sf0.1), so the table mode only
exercises the candidate-pruning win (9.25x at sf0.1), not recall."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from record_matching_spark.session import get_spark  # noqa: E402
from record_matching_spark.functions.similarity import (  # noqa: E402
    cosine, embedding_near_dup_pairs_lsh,
)

REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))


def brute_pairs(df, threshold):
    """Unguarded cartesian arm (the guard in embedding_near_dup_pairs
    exists precisely so production never does this; here it IS the
    baseline being measured)."""
    a = df.select(F.col("vec_id").alias("left"), F.col("embedding").alias("_va"))
    b = df.select(F.col("vec_id").alias("right"), F.col("embedding").alias("_vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("left") < F.col("right"))
        .withColumn("cos", cosine(F.col("_va"), F.col("_vb")))
        .filter(F.col("cos") >= threshold)
        .select("left", "right")
    )


def timed(mk):
    best, rows = float("inf"), None
    for _ in range(REPS):
        t0 = time.monotonic()
        got = {(r["left"], r["right"]) for r in mk().collect()}
        dt = time.monotonic() - t0
        if dt < best:
            best, rows = dt, got
    return best, rows


def synth_clustered(spark, n_clusters=1200, dim=64, seed=7):
    import numpy as np

    rng = np.random.RandomState(seed)
    rows, vid = [], 0
    for _ in range(n_clusters):
        base = rng.normal(size=dim)
        base /= np.linalg.norm(base)
        for _ in range(int(rng.randint(1, 7))):
            v = base + rng.normal(scale=0.05, size=dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "synth"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    spark = get_spark(app_name="embed-lsh-ab")
    if src == "synth":
        e = synth_clustered(spark).localCheckpoint(eager=True)
    else:
        e = spark.read.parquet(f"{src}/embeddings.parquet").select(
            "vec_id", "embedding"
        ).localCheckpoint(eager=True)
    n = e.count()
    la = os.getloadavg()[0]

    t_brute, brute = timed(lambda: brute_pairs(e, threshold))
    t_lsh, lsh = timed(
        lambda: embedding_near_dup_pairs_lsh(
            e, threshold=threshold, n_tables=16, bits=8
        )
    )
    assert lsh <= brute, "LSH arm must be a subset (exact verify)"
    recall = len(lsh) / len(brute) if brute else 1.0
    print(
        f"n={n} tau={threshold} loadavg={la:.1f} | brute {t_brute:.2f}s "
        f"({len(brute)} pairs) | lsh {t_lsh:.2f}s ({len(lsh)} pairs) | "
        f"recall {recall:.4f} | speedup {t_brute / t_lsh:.2f}x"
    )


if __name__ == "__main__":
    main()
