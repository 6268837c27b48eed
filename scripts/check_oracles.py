"""Self-check: run every __spark_entry__ query against its DuckDB oracle
(row count + column names + order-insensitive value multiset), mimicking the
driver's CORRECTNESS gate.
Usage: python scripts/check_oracles.py [sf_dir] [query_substr ...]
— extra args filter to queries whose name contains any substring."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

import __spark_entry__ as entrymod
from record_matching_spark.session import get_spark

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.10g}"
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    spark = get_spark(app_name="oracle-check", driver_memory="8g")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and not any(sub in name for sub in only):
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {dt:.1f}s)")
            if len(srows) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            ddf = con.sql(oracles[name])
            dcols = [c.lower() for c in ddf.columns]
            drows = ddf.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            failures += 1
            continue
        ok = True
        if sorted(c.lower() for c in scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={scols} duck={dcols}")
            ok = False
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            ok = False
        if ok:
            s_idx = sorted(range(len(scols)), key=lambda i: scols[i].lower())
            d_idx = sorted(range(len(dcols)), key=lambda i: dcols[i])
            sset = sorted(tuple(norm_cell(r[i]) for i in s_idx) for r in srows)
            dset = sorted(tuple(norm_cell(r[i]) for i in d_idx) for r in drows)
            if sset != dset:
                ndiff = sum(1 for a, b in zip(sset, dset) if a != b)
                print(f"FAIL {name}: value mismatch ({ndiff}/{len(sset)} rows differ)")
                for a, b in list(zip(sset, dset))[:200]:
                    if a != b:
                        print(f"   spark={a}\n   duck ={b}")
                        break
                ok = False
        if ok:
            print(f"ok   {name}: {len(srows)} rows match ({dt:.1f}s)")
        else:
            failures += 1
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
