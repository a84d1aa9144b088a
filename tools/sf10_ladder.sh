#!/usr/bin/env bash
# sf10 decade push (r14 verdict #7): one decade PAST sf1 for the heavy
# dedup/CC/ANN/admission tier, so the 100 TB scaling claims rest on a
# measured 100x ladder (sf0.1 -> sf1 -> sf10), not a 10x extrapolation.
#
#  - fixtures/sf10 is generated DIRECTLY from /root/testdata/sf0.1 at
#    factor=100 (NOT by re-applying GenScale to fixtures/sf1: sf1's
#    keys already span clone*KEY_STRIDE offsets, so a second pass with
#    the same stride would collide keys across rungs);
#  - both legs (fixtures/sf1, fixtures/sf10) run ISOLATED at the same
#    cpu count and driver heap so the exponent compares plans, not
#    cache pressure or memory sizing (the r14 ladder lesson);
#  - AdmitLadder (multi-batch persisted admission) rides along and is
#    merged in, same as the sf1 ladder.
#
# Usage: tools/sf10_ladder.sh [--mem 64g]
set -euo pipefail
cd "$(dirname "$0")/.."

MEM=64g
while [[ $# -gt 0 ]]; do
  case "$1" in
    --mem) MEM="$2"; shift 2 ;;
    *) echo "unknown arg $1"; exit 2 ;;
  esac
done

# the heavy tier per the r14 verdict: dedup / connected components /
# ANN / admission — the queries whose 100 TB story is the repo's thesis
SUBSET=q_neardup_pairs,q_dedup_components,q_sa_substr,q_sa_substr_w50,q_chunk_dedup,q_minhash_lsh_neardups,q_simhash_neardups,q_cosine_neardups_lsh,q_semdedup,q_kmeans,q_ivf_topk,q_pq_recall,q_ngram_jaccard,q_dup_span_top,q_decontaminate_bloom

mkdir -p target
[[ -d fixtures/sf1 ]] || SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=24g \
  tools/run_main.sh graft.GenScale /root/testdata/sf0.1 fixtures/sf1 10 \
  > target/genscale_sf1.log 2>&1
[[ -d fixtures/sf10 ]] || SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=48g \
  tools/run_main.sh graft.GenScale /root/testdata/sf0.1 fixtures/sf10 100 \
  > target/genscale_sf10.log 2>&1

# the two legs are independent JVMs on different fixtures — run them
# concurrently (run_main.sh sidesteps the sbt lock; Bench writes its
# sidecar to BENCH_LAST.json, so each leg gets its own working dir
# symlinked back would race — instead run sf1 first in background and
# read its sidecar only after wait)
# KEEP=shingles,lshcands on BOTH legs: these are shared INPUT tables
# (rebuilding the sf10 shingle table is ~20 min of untimed warmup per
# consumer query and measures nothing); identical settings on both
# legs keep the exponents comparable. Per-query intermediates still
# drop between queries (the r14 isolation semantics).
SPARK_GRAFT_SF_DIR="$PWD/fixtures/sf1" SPARK_GRAFT_ONLY="$SUBSET" \
  SPARK_GRAFT_ISOLATE=1 SPARK_GRAFT_KEEP=shingles,lshcands \
  SPARK_GRAFT_SIDE_CAR=target/decade_sf1.json SPARK_DRIVER_MEM=24g \
  tools/run_main.sh graft.Bench > target/bench_decade_sf1.log 2>&1 &
PID_SF1=$!
SPARK_GRAFT_SF_DIR="$PWD/fixtures/sf10" SPARK_GRAFT_ONLY="$SUBSET" \
  SPARK_GRAFT_ISOLATE=1 SPARK_GRAFT_KEEP=shingles,lshcands \
  SPARK_GRAFT_SIDE_CAR=target/decade_sf10.json SPARK_DRIVER_MEM="$MEM" \
  tools/run_main.sh graft.Bench > target/bench_decade_sf10.log 2>&1 &
PID_SF10=$!
wait $PID_SF1 $PID_SF10
python3 tools/scale_ladder.py target/decade_sf1.json target/decade_sf10.json \
  BENCH_sf10.json sf1 sf10

SPARK_GRAFT_CPUS=4 SPARK_DRIVER_MEM=24g \
  tools/run_main.sh graft.AdmitLadder "$PWD/fixtures/sf1" 10 \
  2>&1 | grep '"metric"' > target/admit_decade_sf1.json
SPARK_GRAFT_CPUS=4 SPARK_DRIVER_MEM="$MEM" \
  tools/run_main.sh graft.AdmitLadder "$PWD/fixtures/sf10" 10 \
  2>&1 | grep '"metric"' > target/admit_decade_sf10.json
python3 tools/merge_ladder.py BENCH_sf10.json \
  target/admit_decade_sf1.json target/admit_decade_sf10.json
echo "sf10_ladder: done (BENCH_sf10.json)"
