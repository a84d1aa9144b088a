#!/usr/bin/env bash
# sf10 correctness gate (r16 verdict #2): the widened 21-query DuckDB
# gate + the 5-kernel sequential replay, at fixtures/sf10 (100x the
# driver's gate scale), merged into a COMMITTED CORRECTNESS_sf10.json.
#
# Infra hardening baked in (r16 verdict #6): the oracle runs with a
# pinned DuckDB spill dir, a per-oracle disk pre-flight, and a
# per-oracle timeout — an infra failure lands as an explicit
# "skipped: <reason>" row, never a silent hole (the r16 q_pq_recall
# ENOSPC filled / and surfaced as an untriaged missing row).
#
# Usage: tools/sf10_gate.sh [--cpus N] [--mem 48g]
set -euo pipefail
cd "$(dirname "$0")/.."

CPUS=8
MEM=48g
while [[ $# -gt 0 ]]; do
  case "$1" in
    --cpus) CPUS="$2"; shift 2 ;;
    --mem) MEM="$2"; shift 2 ;;
    *) echo "unknown arg $1"; exit 2 ;;
  esac
done

# the r16 gate's 21 queries: one per tier (TPC-H join/agg, signal
# quantized aggregates, text quality, dedup family, ANN family,
# sketches, sessions, streaming probe)
GATE=q05_top_customers,q_cosine_neardups_lsh,q_decontaminate_bloom,q_dedup_exact,q_dup_span_top,q_gopher_rules,q_hash_split,q_hll_distinct,q_integral,q_ivf_topk,q_kmeans,q_langid,q_len_quantiles,q_movrms_time,q_pq_recall,q_rms,q_semdedup,q_sessionize,q_simhash_neardups,q_stream_lsh_match_capped,q_text_stats

mkdir -p target
GSV=$(tools/run_main.sh graft.GenScale --version 2>/dev/null | tail -1)
MARKER="$GSV factor=100 src=/root/testdata/sf0.1"
[[ -f fixtures/sf10/.genscale_v && "$(cat fixtures/sf10/.genscale_v)" == "$MARKER" ]] \
  || { echo "sf10_gate: fixtures/sf10 stale (want '$MARKER') — run tools/sf10_ladder.sh first"; exit 1; }

rm -rf target/verify_sf10
SPARK_GRAFT_CPUS="$CPUS" SPARK_DRIVER_MEM="$MEM" \
  tools/run_main.sh graft.Verify "$PWD/fixtures/sf10" target/verify_sf10 "$GATE" \
  > target/verify_sf10.log 2>&1

# oracle compare: spill to target/duckdb_tmp, refuse to start an oracle
# under 8 GB free, interrupt any oracle past 45 min — all three land
# as "skipped: <reason>" rows instead of silent holes
GRAFT_DUCKDB_TMP=target/duckdb_tmp GRAFT_MIN_FREE_GB=8 GRAFT_ORACLE_TIMEOUT=2700 \
  python3 tools/check.py "$PWD/fixtures/sf10" target/verify_sf10 target/check_sf10.json \
  2>&1 | tee target/check_sf10.log | tail -5

# the 5 sequential kernels + the PQ-recall search-chain replay (r17
# verdict #3: q_pq_recall's DuckDB oracle ENOSPCs at sf10 — the
# in-JVM exact replay is its positive sf10 evidence)
REPLAYS=k_stream_iir,k_resample_cubic,k_rainflow,k_rainflow_binned,k_rainflow_binsize,q_pq_recall_replay
SPARK_GRAFT_CPUS="$CPUS" SPARK_DRIVER_MEM="$MEM" \
  tools/run_main.sh graft.KernelReplay "$PWD/fixtures/sf10" target/kernel_replay_sf10.json "$REPLAYS" \
  > target/kernel_replay_sf10.log 2>&1 \
  || { echo "sf10_gate: kernel replay MISMATCH — see target/kernel_replay_sf10.log"; exit 1; }

# merge the DuckDB gate and the kernel replay into one committed
# artifact, kernel rows mapped onto the gate row shape
python3 - <<'EOF'
import json
gate = json.load(open("target/check_sf10.json"))
kern = json.load(open("target/kernel_replay_sf10.json"))
for name, r in kern.items():
    gate[name] = {"rows_match": r["match"], "schema_match": r["match"],
                  "hash_match": r["match"], "spark_rows": r["rows"],
                  "oracle_rows": r["rows"],
                  "err": None if r["match"] else f"replay: {r['mismatches']} mismatches"}
green = sum(1 for r in gate.values() if r.get("hash_match"))
skipped = {k: r["err"] for k, r in gate.items()
           if r.get("err") and str(r["err"]).startswith("skipped:")}
out = dict(sorted(gate.items()))
json.dump(out, open("CORRECTNESS_sf10.json", "w"), indent=1)
print(f"sf10_gate: {green}/{len(out)} hash-green -> CORRECTNESS_sf10.json"
      + (f"; skipped: {skipped}" if skipped else ""))
EOF
