"""Band-prefilter A/B (VERDICT r2 item 3): candidate_pairs with and
without the bloom-style singleton-band prefilter, same blocks input,
alternated best-of-N, pair-set equality asserted via order-insensitive
fingerprint (the exact equivalence is separately pytest-proven at a
collision-heavy bitmap width — test_prefilter_pair_set_equivalence).

The prefilter prunes definitely-singleton block keys (content-sha keys of
unique files, untouched token-sorted keys) BEFORE the repartition+census+
self-join shuffle; what it buys depends on the singleton fraction, which
this script also reports.

Usage: python scripts/prefilter_ab_bench.py [n_families=24000] [reps=3]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from record_matching_spark.operators.blocking import blocking_keys, candidate_pairs
from record_matching_spark.session import get_spark
from record_matching_spark.operators.normalize import normalize_files
from record_matching_spark.synth import repo_files, synth_repo_files_with_truth


def pair_fp(pairs) -> tuple:
    row = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("left", "right").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return (row["n"], str(row["h"]))


def main() -> None:
    fams = int(sys.argv[1]) if len(sys.argv) > 1 else 24000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="prefilter_ab", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    truth = synth_repo_files_with_truth(
        spark, n_families=fams, seed=42, members_mean=4, heavy_families=2
    )
    norm = normalize_files(repo_files(truth)).localCheckpoint(eager=True)
    blocks = blocking_keys(norm, id_col="fid").localCheckpoint(eager=True)
    n_rows = blocks.count()
    n_singleton = (
        blocks.groupBy("block_key").count().filter(F.col("count") == 1).count()
    )
    print(f"block rows={n_rows} singleton-key rows={n_singleton} "
          f"({100.0 * n_singleton / n_rows:.1f}%)", flush=True)

    walls = {"off": [], "on": []}
    fps = {}
    for rep in range(reps):
        for name, slots in (("off", None), ("on", 24)):
            t0 = time.monotonic()
            p = candidate_pairs(
                blocks, id_col="fid", salt_cap=1000,
                prefilter_log2_slots=slots,
            )
            fp = pair_fp(p)
            dt = time.monotonic() - t0
            walls[name].append(dt)
            fps.setdefault(name, fp)
            assert fps[name] == fp, f"{name} nondeterministic"
            print(f"rep{rep} prefilter={name}: {dt:.2f}s pairs={fp[0]}", flush=True)
    assert fps["off"] == fps["on"], f"pair sets differ: {fps}"
    b_off, b_on = min(walls["off"]), min(walls["on"])
    print(
        f"\n| band prefilter A/B ({n_rows} block rows, "
        f"{100.0 * n_singleton / n_rows:.0f}% singleton keys, best-of-{reps}, "
        f"alternated) | off {b_off:.2f}s | on {b_on:.2f}s | "
        f"{b_off / b_on:.2f}x | pair sets identical ({fps['on'][0]} pairs) |",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
