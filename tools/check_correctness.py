#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <outDir>

Reads <outDir>/oracle_sql.json (written by graft.Verify), runs each SQL in
DuckDB over views named after the parquet tables in <sfDir>, loads the
engine's parquet result from <outDir>/<name>/, sorts columns by name, and
compares values exactly. Dev tool only — NOT part of the engine.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def frame(con, rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = rel.fetchall()
    out = [[norm_cell(r[i]) for i in order] for r in rows]
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver testdata are single files; GenData/Spark-written tables
        # (e.g. the in-repo sf1) are directories of part files
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
        except Exception:
            pass
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    only = sys.argv[3:] or None
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            ocols, orows = frame(con, con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            ecols, erows = frame(con, con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
        except Exception as e:
            print(f"FAIL {name}: engine result unreadable: {e}")
            n_fail += 1
            continue
        if ecols != ocols:
            print(f"FAIL {name}: columns engine={ecols} oracle={ocols}")
            n_fail += 1
            continue
        if len(erows) != len(orows):
            print(f"FAIL {name}: rows engine={len(erows)} oracle={len(orows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(erows, orows)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            i, a, b = bad
            print(f"FAIL {name}: row {i} engine={a} oracle={b} (cols={ecols})")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(erows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
