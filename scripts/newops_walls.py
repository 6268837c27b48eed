"""Informational walls for the round-5 training-pipeline queries at a
given SF dir (default sf0.1, 10x the oracle-check scale): one rep each,
fresh session, launch loadavg disclosed — smoke-tests the new ops at
scale and records ballpark costs in BENCH.md. Not the official bench
(bench.py remains the fixed headline set).
Usage: python scripts/newops_walls.py [sf_dir] [query_substr ...]"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from record_matching_spark.session import get_spark

DEFAULT = ["q39", "q40", "q41", "q42", "q43", "q44", "q45", "q46", "q47",
           "q48", "q49", "q50", "q51", "q52", "q53", "q54"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2:] or DEFAULT
    spark = get_spark(app_name="newops-walls", driver_memory="8g")
    qs = entrymod.queries()
    out = {}
    for name, fn in qs.items():
        if not any(s in name for s in only):
            continue
        load = os.getloadavg()[0]
        t0 = time.monotonic()
        n = fn(spark, sf_dir).count()
        wall = time.monotonic() - t0
        out[name] = (wall, n, load)
        print(f"{name}: {wall:.2f}s rows={n} load={load:.1f}", flush=True)
    print({k: round(v[0], 2) for k, v in out.items()})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
