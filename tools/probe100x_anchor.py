#!/usr/bin/env python3
"""DuckDB anchors for the 100x scale points (same-method as make_anchor.py:
warm best-of-N over views on the corpus parquet), with a hard per-query
timeout: at 100x the quadratic-pair-work oracles (q49/q85) do not finish
in useful time, and ">Ts (killed)" IS the anchor statement — the Spark
side's banding is the whole point at that scale.

Usage: python3 tools/probe100x_anchor.py <corpusDir> <timeoutSec> <query...>
Queries resolve through <verifyOut>/oracle_sql.json (env ORACLE_SQL_JSON,
default /tmp/verify_out/oracle_sql.json). Each query runs in a fresh
subprocess (kill -9 on timeout) and reports best-of-2 (first run warms the
page cache; at these sizes a third rep buys noise, not signal).
Driver-side tooling only.
"""
import json
import os
import re
import subprocess
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

WORKER = r'''
import json, sys, time
import duckdb
corpus, sql = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in %s:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{corpus}/{t}.parquet')")
ts = []
for _ in range(2):
    t0 = time.time()
    con.execute(sql).fetchall()
    ts.append(time.time() - t0)
print(json.dumps({"best": min(ts), "runs": ts}))
''' % repr(TABLES)


def main():
    corpus, timeout = sys.argv[1], float(sys.argv[2])
    names = sys.argv[3:]
    oracle = json.load(open(os.environ.get(
        "ORACLE_SQL_JSON", "/tmp/verify_out/oracle_sql.json")))
    for name in names:
        sql = oracle[name]
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, "-c", WORKER, corpus, sql],
                capture_output=True, text=True, timeout=timeout)
            if out.returncode != 0:
                print(f"== {name}: ERROR {out.stderr.strip()[:200]}")
            else:
                # duckdb can emit progress noise on stdout, sometimes on
                # the SAME line as the result (carriage-return progress
                # bars). Scan EVERY '{' position left-to-right (r17,
                # advisor note): a nested object in the result JSON or a
                # stray brace after it must not skip a valid line
                r = None
                for ln in reversed(out.stdout.strip().splitlines()):
                    for m in re.finditer(r"\{", ln):
                        try:
                            r = json.loads(ln[m.start():])
                            break
                        except ValueError:
                            continue
                    if r is not None:
                        break
                if r is None:
                    print(f"== {name}: UNPARSEABLE {out.stdout[-200:]!r}")
                    continue
                print(f"== {name}: best {r['best']:.2f}s of "
                      f"{[round(t, 2) for t in r['runs']]}")
        except subprocess.TimeoutExpired:
            print(f"== {name}: >{timeout:.0f}s (killed after "
                  f"{time.time() - t0:.0f}s wall)")


if __name__ == "__main__":
    main()
