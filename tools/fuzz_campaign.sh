#!/bin/bash
# Chunked fuzzer campaign (r17): run the PropertySpec fuzz tests at
# GRAFT_FUZZ_SEEDS per chunk across FRESH JVMs — checkpointed store frames
# from each seed stay in the block manager until JVM exit, so one long
# in-JVM campaign slows superlinearly while fixed-size chunks stay flat.
# Usage: tools/fuzz_campaign.sh <totalSeeds> [chunk]
set -u
TOTAL="${1:-50}"; CHUNK="${2:-10}"
BASE=0
while [ "$BASE" -lt "$TOTAL" ]; do
  N=$(( TOTAL - BASE < CHUNK ? TOTAL - BASE : CHUNK ))
  echo "[fuzz_campaign] seeds $((BASE+1))..$((BASE+N))"
  GRAFT_FUZZ_SEEDS="$N" GRAFT_FUZZ_SEED_BASE="$BASE" \
    sbt -batch "testOnly graft.PropertySpec" 2>&1 | grep -E "FAILED|succeeded|seed=" | tail -4
  BASE=$(( BASE + N ))
done
