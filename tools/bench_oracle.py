#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB over the same parquet tables the engine
benches against — external grounding for BASELINE.md's 2x gate.

Usage: python3 tools/bench_oracle.py <sfDir> <outDir> [names...]

Reads <outDir>/oracle_sql.json (written by graft.Verify), runs each SQL in
DuckDB (full materialization via fetchall), and prints one JSON object
{"queries": {name: seconds}, "sf": sfDir, "duckdb": version}. Each query is
run twice and the MINIMUM kept (first run absorbs I/O warmup). Dev tool
only — NOT part of the engine; DuckDB is the driver-side oracle.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:]) or None
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except Exception:
            pass
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name in sorted(oracle):
        if only and name not in only:
            continue
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            try:
                con.sql(oracle[name]).fetchall()
            except Exception:
                best = -1.0
                break
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 4)
    print(json.dumps({"queries": times, "sf": sf_dir,
                      "duckdb": duckdb.__version__}))


if __name__ == "__main__":
    main()
