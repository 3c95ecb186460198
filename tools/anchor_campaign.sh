#!/bin/bash
# Anchor-promotion campaign (r17, verdict #3): N spaced, load-gated,
# full-suite Bench runs at one SF, each written to its own candidate
# artifact. The promotion rule (see tools/promote_anchor.py) replaced the
# single-run <=1.05 gate that refused ~22 attempts across r14-r16 on a
# bimodal box: an anchor is now cut as the per-query MEDIAN of N>=5 runs
# that all certified contended:false — medians are robust to one slow-mode
# run leaking through the load gate, and every query in the CURRENT suite
# gets an anchor row (the r12-era 127-query anchor left the 17 newest
# queries invisible to the contention detector).
# Usage: tools/anchor_campaign.sh <outPrefix> <sfDir> <nRuns> [gapSeconds]
set -u
PREFIX="$1"; SF="$2"; N="$3"; GAP="${4:-180}"
for i in $(seq 1 "$N"); do
  until awk '{exit !($1 < 0.3)}' /proc/loadavg; do sleep 15; done
  echo "[anchor_campaign] run $i/$N starting at $(cat /proc/loadavg)"
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_OUT="${PREFIX}_a${i}.json" \
    SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-16g}" \
    tools/bench.sh ignored 2>"/tmp/anchor_a${i}.err" | tail -1
  [ "$i" -lt "$N" ] && sleep "$GAP"
done
