#!/usr/bin/env python3
"""Cut a CORRECTNESS_SF*.json artifact (same per-query shape as the
driver's CORRECTNESS_r*.json) from a graft.Verify dump + DuckDB oracle.

Same comparison semantics as tools/check_correctness.py (sort columns by
name, normalize cells, exact compare), but emits the JSON artifact the
other scales have instead of PASS/FAIL text. Dev tool only.

Usage: tools/correctness_artifact.py <sfDir> <outDir> <artifact.json> [names...]
"""
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_correctness import TABLES, frame  # noqa: E402


def main():
    sf_dir, out_dir, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
    only = sys.argv[4:] or None
    con = duckdb.connect()
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
        except Exception:
            pass
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    result = {}
    for name in sorted(oracle):
        if only and name not in only:
            continue
        if not os.path.isdir(f"{out_dir}/{name}"):
            continue
        cell = {"rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            ecols, erows = frame(con, con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
            cell["spark_rows"] = len(erows)
            ocols, orows = frame(con, con.sql(oracle[name]))
            cell["oracle_rows"] = len(orows)
            cell["rows_match"] = len(erows) == len(orows)
            cell["schema_match"] = ecols == ocols
            cell["hash_match"] = (cell["rows_match"] and cell["schema_match"]
                                  and erows == orows)
            if not cell["hash_match"]:
                cell["err"] = "mismatch"
        except Exception as e:
            cell["err"] = str(e)[:200]
        result[name] = cell
        print(name, "PASS" if cell["hash_match"] else f"FAIL {cell['err']}")
    with open(artifact, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(f"wrote {artifact}: {len(result)} cells, "
          f"{sum(1 for c in result.values() if c['hash_match'])} hash-verified")


if __name__ == "__main__":
    main()
