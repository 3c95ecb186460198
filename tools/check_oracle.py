#!/usr/bin/env python3
"""Local pre-driver oracle check: compare Verify output parquet vs DuckDB.

Usage: check_oracle.py <verify_out_dir> <sf_dir> [query ...]
Mirrors the driver's compare: sort columns by name, order rows by all
columns, compare cell values (exact; floats via repr).
"""
import json, sys, glob, os
import duckdb
import numpy as np
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # list/array cells are unhashable and break sort_values — stringify them
    # (both sides stringify the same way, so the compare stays faithful)
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple, np.ndarray))).any():
            df[c] = df[c].map(
                lambda v: ",".join(str(x) for x in v)
                if isinstance(v, (list, tuple, np.ndarray)) else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def cell(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return ""
    if isinstance(v, float):
        return repr(v)
    return str(v)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem",
              "events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        eng_path = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(eng_path, "*.parquet"))
        if not files:
            print(f"MISSING-ENGINE {name}")
            n_bad += 1
            continue
        try:
            eng = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            ora = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_bad += 1
            continue
        ecols, ocols = list(eng.columns), list(ora.columns)
        if ecols != ocols:
            print(f"SCHEMA-MISMATCH {name}: engine={ecols} oracle={ocols}")
            n_bad += 1
            continue
        if len(eng) != len(ora):
            print(f"ROWCOUNT-MISMATCH {name}: engine={len(eng)} oracle={len(ora)}")
            n_bad += 1
            continue
        em = eng.applymap(cell) if hasattr(eng, "applymap") else eng.map(cell)
        om = ora.applymap(cell) if hasattr(ora, "applymap") else ora.map(cell)
        if not em.equals(om):
            diff = (em != om)
            bad_rows = diff.any(axis=1)
            idx = list(em.index[bad_rows])[:3]
            print(f"VALUE-MISMATCH {name}: {int(bad_rows.sum())} rows differ; first at {idx}")
            for i in idx[:2]:
                print(f"  engine: {em.loc[i].to_dict()}")
                print(f"  oracle: {om.loc[i].to_dict()}")
            n_bad += 1
            continue
        print(f"OK {name} ({len(eng)} rows)")
        n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
