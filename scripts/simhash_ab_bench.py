"""SimHash UDF A/B (VERDICT r3 item 4): per-doc Python-loop packing vs the
round-4 flat segment-reduceat vectorization, same session, alternated
best-of-N, byte-equality asserted.

The r3 implementation ALSO carried a uint64 vote-underflow bug (bits.sum()
in uint64 made `2*ones - n` wrap for minority bits, saturating signatures
toward all-ones — found by the q24 DuckDB oracle, regression-gated in
test_round4). The "loop" arm here uses the loop STRUCTURE with corrected
int64 vote math, so the A/B isolates the vectorization win alone and both
arms must agree bit-for-bit with the shipped UDF.

Usage: python scripts/simhash_ab_bench.py [sf_dir=/root/testdata/sf0.1] [reps=3]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from record_matching_spark.functions.dedup import simhash64
from record_matching_spark.operators.normalize import tokenize
from record_matching_spark.session import get_spark


def simhash64_loop(df, text_col="text", id_col="doc_id"):
    """The round-3 per-doc loop structure, vote math corrected to int64."""

    @F.pandas_udf(LongType())
    def udf(token_hashes: pd.Series) -> pd.Series:
        out = np.zeros(len(token_hashes), dtype=np.int64)
        for i, arr in enumerate(token_hashes):
            if arr is None or len(arr) == 0:
                continue
            h = np.asarray(arr, dtype=np.int64).astype(np.uint64)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
            votes = bits.sum(axis=0).astype(np.int64) * 2 - len(h)
            sig = np.uint64(0)
            for b in range(64):
                if votes[b] > 0:
                    sig |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(sig)
        return pd.Series(out)

    th = F.transform(tokenize(F.col(text_col)), lambda t: F.xxhash64(t))
    return df.select(F.col(id_col), udf(th).alias("simhash"))


def fp(df):
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("doc_id", "simhash").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return (r["n"], str(r["h"]))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="simhash_ab", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").localCheckpoint(
        eager=True
    )
    n = docs.count()
    walls = {"loop": [], "vectorized": []}
    fps = {}
    for rep in range(reps):
        for name, fn in (("loop", simhash64_loop), ("vectorized", simhash64)):
            t0 = time.monotonic()
            f = fp(fn(docs))
            walls[name].append(time.monotonic() - t0)
            fps.setdefault(name, f)
            assert fps[name] == f, f"{name} nondeterministic"
            print(f"rep{rep} {name}: {walls[name][-1]:.2f}s", flush=True)
    assert fps["loop"] == fps["vectorized"], f"outputs differ: {fps}"
    b_l, b_v = min(walls["loop"]), min(walls["vectorized"])
    print(
        f"\n| simhash UDF A/B ({n} docs, best-of-{reps}, alternated, "
        f"byte-equal outputs) | per-doc loop {b_l:.2f}s | "
        f"vectorized {b_v:.2f}s | {b_l / b_v:.2f}x |",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
