#!/usr/bin/env bash
# Round-closing sequence with the artifact ordering ENFORCED (r9
# verdict "What's wrong #1": a subset bench interleaving between the
# full bench and gen_status overwrote BENCH_LAST.json and drifted the
# closing numbers; sbt-test counts were parsed from the wrong line).
#
#   1. full verify matrix at sf0.001 and sf0.01  -> target/verify_summary.log
#   2. sbt test                                  -> target/test_summary.log
#   3. (optional --ladder) GenScale + subset benches -> BENCH_sf1.json
#   4. FULL bench at sf0.1                       -> BENCH_LAST.json
#   5. gen_status.py                             -> SURVEY/PLANS status blocks
#
# The full bench is LAST before gen_status by construction, so no
# subset sidecar can be what the status block reads.
#
# Usage: tools/close_round.sh [--ladder] [--top N]
set -euo pipefail
cd "$(dirname "$0")/.."

LADDER=0
# default covers EVERY query (r14 verdict #4: the exponent table is
# the repo's strongest scale argument — make it total); --top N still
# narrows it for quick ladders
TOP=400
while [[ $# -gt 0 ]]; do
  case "$1" in
    --ladder) LADDER=1; shift ;;
    --top) TOP="$2"; shift 2 ;;
    *) echo "unknown arg $1"; exit 2 ;;
  esac
done

mkdir -p target
: > target/verify_summary.log

for SF in 0.001 0.01; do
  OUT="target/verify_sf${SF}"
  rm -rf "$OUT"
  sbt -batch "runMain graft.Verify /root/testdata/sf${SF} ${OUT}" \
    > "target/verify_run_sf${SF}.log" 2>&1
  # gen_status.py keys the oracle line on an "sfX.XXX:" prefix that
  # check.py itself does not emit — add it here so the status block
  # never degrades to "oracle: n/a (unparseable)"
  python3 tools/check.py "/root/testdata/sf${SF}" "$OUT" \
    | sed "s|^\([0-9][0-9]*/[0-9][0-9]* oracle queries match\)$|sf${SF}: \1|" \
    | tee -a target/verify_summary.log
done

sbt -batch test 2>&1 | tee target/test_summary.log | tail -5

if [[ "$LADDER" == "1" ]]; then
  # subset = the TOP most expensive queries per the freshest full
  # bench available at entry (last round's sidecar/artifact). The
  # parsed bench line only carries the 40 slowest queries, so TOP
  # >= 100 means "every query": skip the subset filter entirely.
  if [[ "$TOP" -ge 100 ]]; then
    SUBSET=""
  else
  SUBSET=$(python3 - "$TOP" <<'EOF'
import json, os, sys
top = int(sys.argv[1])
import re as _re
if os.path.exists("BENCH_LAST.json"):
    src = "BENCH_LAST.json"
else:
    cands = [p for p in os.listdir(".")
             if _re.match(r"BENCH_r\d+\.json$", p)]
    if not cands:
        sys.exit("close_round: no BENCH_LAST.json and no BENCH_r*.json "
                 "— run a full bench first")
    src = max(cands, key=lambda p: int(_re.search(r"_r(\d+)", p).group(1)))
q = json.load(open(src))["queries"]
print(",".join(sorted(sorted(q, key=lambda k: -q[k])[:top])))
EOF
)
  fi
  GSV=$(tools/run_main.sh graft.GenScale --version 2>/dev/null | tail -1)
  # FULL-marker reuse guard (r15 advice + r16 advice): regenerate when
  # the marker is missing, from a different GenScale scheme, or from a
  # different factor/source (a right-version wrong-factor directory
  # would otherwise be silently reused)
  fixture_fresh() { # <dir> <expected factor>
    [[ -f "$1/.genscale_v" ]] && \
      [[ "$(cat "$1/.genscale_v")" == "$GSV factor=$2 src=/root/testdata/sf0.1" ]]
  }
  fixture_fresh fixtures/sf1 10 || sbt -batch "runMain graft.GenScale /root/testdata/sf0.1 fixtures/sf1 10" \
    > target/genscale.log 2>&1
  # ISOLATE=1 + 24g on BOTH legs (r14 verdict #2/#3): the crowded
  # shared-cache sweep at sf1 exhausted the 8g JVM's Tungsten memory
  # and three rounds of ladder rows needed isolated-re-measure prose;
  # isolation makes the committed artifact the adjudicated truth, and
  # both legs must share measurement semantics or exponents skew
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_ONLY="$SUBSET" \
    SPARK_GRAFT_ISOLATE=1 SPARK_DRIVER_MEM=24g \
    sbt -batch "runMain graft.Bench" > target/bench_ladder_sf01.log 2>&1
  cp BENCH_LAST.json target/ladder_sf01.json
  SPARK_GRAFT_SF_DIR="$PWD/fixtures/sf1" SPARK_GRAFT_ONLY="$SUBSET" \
    SPARK_GRAFT_ISOLATE=1 SPARK_DRIVER_MEM=24g \
    sbt -batch "runMain graft.Bench" > target/bench_ladder_sf1.log 2>&1
  cp BENCH_LAST.json target/ladder_sf1.json
  python3 tools/scale_ladder.py target/ladder_sf01.json target/ladder_sf1.json BENCH_sf1.json
  # the multi-batch persisted-admission harness is a separate main
  # (its stream staging can't live in Bench's query map) — same
  # warm-min discipline, merged into the ladder afterwards
  SPARK_GRAFT_CPUS=4 sbt -batch "runMain graft.AdmitLadder /root/testdata/sf0.1 10" \
    2>&1 | grep '"metric"' > target/admit_sf01.json
  SPARK_GRAFT_CPUS=4 sbt -batch "runMain graft.AdmitLadder $PWD/fixtures/sf1 10" \
    2>&1 | grep '"metric"' > target/admit_sf1.json
  python3 tools/merge_ladder.py BENCH_sf1.json target/admit_sf01.json target/admit_sf1.json
fi

# restart-recovery gate (r17 verdict #7): re-verify the persisted-
# admission resume path at sf1 EVERY round close, so it can never
# silently rot between rounds. Needs the sf1 fixture; refuse to reuse
# a stale one (same marker discipline as the ladder).
GSV=${GSV:-$(tools/run_main.sh graft.GenScale --version 2>/dev/null | tail -1)}
if [[ -f fixtures/sf1/.genscale_v && \
      "$(cat fixtures/sf1/.genscale_v)" == "$GSV factor=10 src=/root/testdata/sf0.1" ]]; then
  SPARK_GRAFT_CPUS=4 sbt -batch "runMain graft.AdmitRestart $PWD/fixtures/sf1 10 5" \
    2>&1 | tee target/admit_restart.log | grep '"metric"' \
    > CORRECTNESS_restart_sf1.json
  grep -q '"restart_hash_match":true' CORRECTNESS_restart_sf1.json \
    || { echo "close_round: RESTART RECOVERY FAILED — see target/admit_restart.log"; exit 1; }
  echo "close_round: restart gate green -> CORRECTNESS_restart_sf1.json"
else
  echo "close_round: WARNING fixtures/sf1 stale/absent — restart gate SKIPPED" \
       "(run with --ladder to regenerate)"
fi

# CPUS=32 = the DRIVER'S instrument (local[32]); the r17 "bench
# recovered to 113.9 s" claim was a local[4] number that could never
# reproduce on the driver's run (r17 verdict #1) — the committed
# closing number must come from the same instrument the driver reads
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -3

python3 tools/gen_status.py
echo "close_round: done (BENCH_LAST.json + status blocks regenerated in order)"
