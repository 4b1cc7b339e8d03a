#!/bin/bash
# Min-merge bench campaign: N sequential full Bench runs at sf0.1 /
# CPUS=32, committing BENCH_LOCAL.json after each merge (artifact-only
# commits — src/main must stay FROZEN for the whole campaign or the
# src_stamp resets the series). Nothing else CPU-heavy may run
# concurrently, including a second sbt (build-lock contention).
set -u
cd "$(dirname "$0")/.."
N="${1:-8}"
for i in $(seq 1 "$N"); do
  echo "[campaign] run $i/$N starting $(date -u +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    timeout 3600 sbt -batch 'runMain graft.Bench' \
    > "/tmp/bench_campaign_run${i}.log" 2>&1
  rc=$?
  echo "[campaign] run $i/$N rc=$rc $(date -u +%H:%M:%S)"
  tail -c 2000 "/tmp/bench_campaign_run${i}.log" | tail -2
  if git status --porcelain BENCH_LOCAL.json | grep -q .; then
    git add BENCH_LOCAL.json
    git commit -q -m "Merge bench run at the round-15 stamp (campaign run $i)" \
      --no-verify
    echo "[campaign] committed merge $i"
  fi
done
echo "[campaign] done"
