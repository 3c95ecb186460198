#!/bin/bash
# Load-gated scale-subset runner (r16): one Bench subset invocation per
# SF dir, each point gated on 1-min loadavg < 0.3 so no point inherits
# its predecessor's residual load (the r15 subset ran back-to-back and
# self-flagged contended at all four points). Usage:
#   tools/scale_subset.sh <outPrefix> <sfDir> [sfDir ...]
# Writes <outPrefix>.<sfName>.subset.json per point (Bench's subset
# routing appends .subset).
set -u
PREFIX="$1"; shift
QUERIES="q01_table_counts q02_filter_project q04_broadcast_star \
q105_cypher_path_rels q121_cypher_label_mutation q125_cypher_membership_pred \
q126_cypher_labels_enum q127_cypher_where_label_disjunction \
q128_cypher_shortest_label_disjunction q129_cypher_out_of_branch_membership \
q130_cypher_native_label_safety q131_cypher_optional_shortest_disjunction \
q132_cypher_shortest_disjunction_membership q133_cypher_disjunction_shared_member \
q134_cypher_merge_member_routing q135_cypher_delete_member_node \
q136_cypher_chained_membership q33_connected_components q34_bfs_distance \
q47_minhash_neardup q48_simhash_neardup q50_ann_lsh q58_ann_ivf \
q81_bucketed_join q85_cypher_hetero_shortest q91_cypher_hetero_disjunction"
for SF in "$@"; do
  NAME=$(basename "$SF")
  until awk '{exit !($1 < 0.3)}' /proc/loadavg; do sleep 15; done
  echo "[scale_subset] $NAME starting at $(cat /proc/loadavg)"
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_OUT="${PREFIX}.${NAME}.json" \
    SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-16g}" \
    tools/bench.sh ignored $QUERIES 2>"/tmp/subset_${NAME}.err" | tail -1
done
