#!/usr/bin/env python3
"""Regenerate the DuckDB wall-time anchor for BASELINE.md.

Usage: python3 tools/make_anchor.py <sf_dir> <oracle_sql.json> <out.json>

Runs every oracle SQL in DuckDB (views over the same parquet the Spark
bench reads), warm best-of-3 per query, and writes {total_sec, queries}.
Mirrors graft.Bench's method (warmup + best-of-3, r10 — both sides moved
from best-of-2 together so the ratio stays steady-state vs steady-state
on a box with multi-second scheduler hiccups).
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, oracle_path: str, out_path: str) -> None:
    oracles = json.load(open(oracle_path))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    times = {}
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            con.execute(sql).fetchall()  # warmup
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                best = min(best, time.perf_counter() - t0)
            times[name] = round(best, 4)
        except Exception as e:  # noqa: BLE001 - record, don't mask
            times[name] = -1.0
            print(f"ERROR {name}: {e}", file=sys.stderr)
        print(f"{name}: {times[name]}")
    out = {
        "total_sec": round(sum(v for v in times.values() if v >= 0), 3),
        "queries": times,
        "sf": sf_dir,
    }
    json.dump(out, open(out_path, "w"), indent=1)
    print(f"total {out['total_sec']}s over {len(times)} queries -> {out_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
