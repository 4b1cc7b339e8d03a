#!/bin/bash
# Min-merge bench campaign: N sequential full Bench runs at sf0.1 /
# CPUS=32, committing BENCH_LOCAL.json after each merge (artifact-only
# commits — src/main must stay FROZEN for the whole campaign or the
# src_stamp resets the series). Nothing else CPU-heavy may run
# concurrently, including a second sbt (build-lock contention).
#
# Usage: tools/bench_campaign.sh [N] [LABEL]
#   N      runs (default 8)
#   LABEL  human label for commit messages (default: short HEAD at launch)
#
# The freeze is ENFORCED, not just documented: before every run the
# working tree's src stamp (claims_check's mirror) must equal the
# artifact stamp of the campaign's first merge, and runs_merged must
# grow by exactly 1 per run — a stray mid-campaign src edit or a
# mc_threads-rerouted artifact aborts the loop loudly instead of
# silently committing a fresh series under 'Merge bench run' messages.
set -u
cd "$(dirname "$0")/.."
N="${1:-8}"
LABEL="${2:-$(git rev-parse --short HEAD)}"

artifact_state() {
  python3 -c "import json;d=json.load(open('BENCH_LOCAL.json'));print(d.get('src_stamp',''),d.get('runs_merged',0))" 2>/dev/null
}
tree_stamp() {
  python3 -c "import sys;sys.path.insert(0,'tools');import claims_check as c;print(c.current_src_stamp())"
}

campaign_stamp=""
prev_runs=-1
for i in $(seq 1 "$N"); do
  ts="$(tree_stamp)"
  if [ -n "$campaign_stamp" ] && [ "$ts" != "$campaign_stamp" ]; then
    echo "[campaign] ABORT before run $i: src/main changed mid-campaign" \
      "(tree stamp $ts != campaign stamp $campaign_stamp) — the min-merge" \
      "series would silently reset; re-launch the campaign at the new stamp"
    exit 1
  fi
  echo "[campaign] run $i/$N starting $(date -u +%H:%M:%S) (stamp ${ts:0:12})"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    timeout 3600 sbt -batch 'runMain graft.Bench' \
    > "/tmp/bench_campaign_run${i}.log" 2>&1
  rc=$?
  echo "[campaign] run $i/$N rc=$rc $(date -u +%H:%M:%S)"
  tail -c 2000 "/tmp/bench_campaign_run${i}.log" | tail -2
  if [ "$rc" -ne 0 ]; then
    # a non-zero run (timeout kill mid-gate) has already flushed partial
    # mid-gate merges into BENCH_LOCAL.json, bumping runs_merged — do NOT
    # commit a truncated run as a normal campaign merge
    echo "[campaign] ABORT after run $i: bench exited rc=$rc — truncated" \
      "run left partial merges in BENCH_LOCAL.json; inspect (git checkout" \
      "-- BENCH_LOCAL.json to discard) before relaunching"
    exit 1
  fi
  read -r art_stamp art_runs <<< "$(artifact_state)"
  if [ -z "${art_stamp:-}" ]; then
    echo "[campaign] ABORT after run $i: BENCH_LOCAL.json unreadable"
    exit 1
  fi
  if [ -z "$campaign_stamp" ]; then
    campaign_stamp="$art_stamp"
    prev_runs=$((art_runs - 1))
  fi
  if [ "$art_stamp" != "$campaign_stamp" ]; then
    echo "[campaign] ABORT after run $i: artifact stamp $art_stamp !=" \
      "campaign stamp $campaign_stamp — series reset detected, NOT committing"
    exit 1
  fi
  if [ "$art_runs" -ne $((prev_runs + 1)) ]; then
    echo "[campaign] ABORT after run $i: runs_merged $art_runs is not" \
      "$((prev_runs + 1)) — merge skipped or series clobbered, NOT committing"
    exit 1
  fi
  prev_runs="$art_runs"
  if git status --porcelain BENCH_LOCAL.json | grep -q .; then
    git add BENCH_LOCAL.json
    git commit -q -m "Merge bench run at the $LABEL stamp (campaign run $i, runs_merged=$art_runs)" \
      --no-verify
    echo "[campaign] committed merge $i (runs_merged=$art_runs)"
  fi
done
echo "[campaign] done"
