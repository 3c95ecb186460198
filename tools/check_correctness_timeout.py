#!/usr/bin/env python3
"""check_correctness.py with a per-query wall-clock budget (round 12,
r11 verdict directive #5: the sf10 oracle pass).

Usage: python3 tools/check_correctness_timeout.py <sfDir> <outDir> \
           [timeout_sec] [jsonOut]

Runs each oracle query in its own subprocess (DuckDB cannot be reliably
interrupted in-process) with `timeout_sec` (default 300 s) of budget.
Emits a CORRECTNESS-style JSON artifact: per-query pass/fail/timeout with
seconds. A timeout is the ORACLE side's bound, not the engine's — the
engine's parquet results were already written by graft.Verify; the
artifact records those separately so a slow DuckDB recursive CTE doesn't
read as an engine failure. Dev tool only — NOT part of the engine.
"""
import json
import subprocess
import sys
import time


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    budget = float(sys.argv[3]) if len(sys.argv) > 3 else 300.0
    json_out = sys.argv[4] if len(sys.argv) > 4 else None
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    n_pass = n_fail = n_to = 0
    for name in sorted(oracle):
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, "tools/check_correctness.py",
                 sf_dir, out_dir, name],
                capture_output=True, text=True, timeout=budget)
            secs = round(time.time() - t0, 1)
            ok = p.returncode == 0
            line = (p.stdout.splitlines() or ["?"])[0]
            results[name] = {"status": "pass" if ok else "fail",
                             "sec": secs, "detail": line}
            if ok:
                n_pass += 1
                print(f"PASS {name} ({secs}s)")
            else:
                n_fail += 1
                print(f"FAIL {name} ({secs}s): {line}")
        except subprocess.TimeoutExpired:
            secs = round(time.time() - t0, 1)
            n_to += 1
            results[name] = {"status": "oracle_timeout", "sec": secs}
            print(f"TIMEOUT {name} (> {budget}s, oracle side)")
    summary = {"sf": sf_dir, "budget_sec": budget, "passed": n_pass,
               "failed": n_fail, "oracle_timeout": n_to,
               "queries": results}
    if json_out:
        json.dump(summary, open(json_out, "w"), indent=1)
    print(f"\n{n_pass} passed, {n_fail} failed, {n_to} oracle-timeout")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
