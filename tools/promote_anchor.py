#!/usr/bin/env python3
"""Anchor promotion from a campaign of clean full-suite runs (r17).

Policy (replaces the r13-era single-run <=1.05 gate, which refused ~22
clean-window attempts across r14-r16 because the box is bimodal at the
hypervisor level):

  - input: N >= 5 full-suite Bench artifacts from tools/anchor_campaign.sh;
  - every run must self-certify contended:false (load-gated start, total
    and median-ratio clauses all clean) — a single contended run aborts
    the promotion rather than being silently dropped;
  - every run must cover the SAME query set (the current full suite);
  - the anchor's per-query time is the MEDIAN across runs (robust to one
    slow-mode run leaking through the gates), its total is the sum of the
    medians (a synthetic "typical clean run", not any single run's total);
  - the superseded anchor is renamed *.superseded_rNN.json, never deleted.

The output artifact carries contended:false (Bench.recordQueries requires
it) plus a `policy` object naming the rule and the source runs, so a
future reader can reconstruct how the anchor was cut.

Usage: tools/promote_anchor.py <out.json> <roundTag> <candidate.json>...
"""
import json
import statistics
import sys


def main() -> int:
    out, round_tag, cands = sys.argv[1], sys.argv[2], sys.argv[3:]
    if len(cands) < 5:
        print(f"REFUSED: need >=5 candidate runs, got {len(cands)}")
        return 1
    runs = []
    sfs = set()
    for path in cands:
        # a contended campaign run is rerouted by Bench to
        # <prefix>_aN.contended.json, so the advertised clean path not
        # existing IS the refusal signal, not a traceback (ADVICE r17)
        try:
            with open(path) as f:
                d = json.load(f)
        except FileNotFoundError:
            print(f"REFUSED: {path} missing — the run was likely rerouted "
                  f"to *.contended.json by Bench's contention gate")
            return 1
        except json.JSONDecodeError as e:
            print(f"REFUSED: {path} is not valid JSON ({e})")
            return 1
        if d.get("contended") is not False:
            print(f"REFUSED: {path} is not contended:false")
            return 1
        if d.get("errors"):
            print(f"REFUSED: {path} has per-query errors: {d['errors']}")
            return 1
        sfs.add(d.get("sf"))
        runs.append((path, d["queries"]))
    if len(sfs) != 1:
        print(f"REFUSED: candidates span multiple SFs: {sorted(map(str, sfs))}")
        return 1
    names = set(runs[0][1])
    for path, qs in runs[1:]:
        if set(qs) != names:
            print(f"REFUSED: {path} covers a different query set")
            return 1
    anchor = {q: statistics.median(qs[q] for _, qs in runs) for q in sorted(names)}
    total = sum(anchor.values())
    artifact = {
        "metric": "total",
        "value": total,
        "unit": "sec",
        "sf": next(iter(sfs)),
        "queries": anchor,
        "contended": False,
        "policy": {
            "rule": "median-of-N clean-window runs (r17 anchor policy)",
            "round": round_tag,
            "n_runs": len(runs),
            "source_runs": [p for p, _ in runs],
            "per_run_totals": [round(sum(qs.values()), 3) for _, qs in runs],
        },
    }
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"PROMOTED {out}: {len(anchor)} queries, total {total:.2f}s "
          f"(per-run totals: {artifact['policy']['per_run_totals']})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
