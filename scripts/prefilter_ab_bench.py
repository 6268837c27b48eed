"""Band-prefilter A/B (VERDICT r2 item 3): candidate_pairs with and
without the bloom-style singleton-band prefilter, same blocks input,
alternated best-of-N, pair-set equality asserted via order-insensitive
fingerprint (the exact equivalence is separately pytest-proven at a
collision-heavy bitmap width — test_prefilter_pair_set_equivalence).

The prefilter prunes definitely-singleton block keys (content-sha keys of
unique files, untouched token-sorted keys) BEFORE the repartition+census+
self-join shuffle; what it buys depends on the singleton fraction, which
this script also reports.

Round 4 adds the third arm — prefilter="auto" (sketch always, filter
only when the measured drop fraction clears the threshold) — and a
members_mean knob: members_mean=1 synthesizes the singleton-dominated
regime where the filter should win and auto must switch it on;
the default corpus is the ~21%-singleton regime where it loses and auto
must switch it off. The auto arm's wall should track the winner in both.

Usage: python scripts/prefilter_ab_bench.py [n_families=24000] [reps=3] [members_mean=4] [heavy_families=2] [extra_singletons=0]
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
    members_mean = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    heavy = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    extra_singletons = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    spark = get_spark(app_name="prefilter_ab", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    truth = synth_repo_files_with_truth(
        spark, n_families=fams, seed=42, members_mean=members_mean,
        heavy_families=heavy,
    )
    norm = normalize_files(repo_files(truth)).localCheckpoint(eager=True)
    blocks = blocking_keys(norm, id_col="fid")
    if extra_singletons:
        # the web-scale regime: most content unique, so most content-sha /
        # token-sorted / LSH keys block nothing — modeled as unique-key
        # rows unioned onto the real blocks (they form no pairs, so the
        # pair-set equality assertion is unaffected)
        noise = spark.range(extra_singletons).select(
            (-F.col("id") - 1).alias("fid"),
            F.xxhash64(F.lit("noise"), F.col("id")).alias("block_key"),
        )
        blocks = blocks.unionByName(noise)
    blocks = blocks.localCheckpoint(eager=True)
    n_rows = blocks.count()
    n_singleton = (
        blocks.groupBy("block_key").count().filter(F.col("count") == 1).count()
    )
    print(f"block rows={n_rows} singleton-key rows={n_singleton} "
          f"({100.0 * n_singleton / n_rows:.1f}%)", flush=True)

    walls = {"off": [], "on": [], "auto": []}
    fps = {}
    for rep in range(reps):
        for name, slots in (("off", None), ("on", 24), ("auto", "auto")):
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
    assert fps["off"] == fps["on"] == fps["auto"], f"pair sets differ: {fps}"
    b_off, b_on, b_auto = (min(walls[k]) for k in ("off", "on", "auto"))
    print(
        f"\n| band prefilter A/B ({n_rows} block rows, "
        f"{100.0 * n_singleton / n_rows:.0f}% singleton keys, "
        f"members_mean={members_mean}, best-of-{reps}, alternated) "
        f"| off {b_off:.2f}s | on {b_on:.2f}s | auto {b_auto:.2f}s | "
        f"on/off {b_off / b_on:.2f}x | "
        f"auto tracks {'on' if abs(b_auto-b_on) < abs(b_auto-b_off) else 'off'} "
        f"| pair sets identical ({fps['on'][0]} pairs) |",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
