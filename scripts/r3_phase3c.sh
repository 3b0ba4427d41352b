#!/usr/bin/env bash
# Round-3 phase 3c: CPU-only continuation — the accelerator tunnel died
# mid-round (see experiments/README.md); everything here is f64 and pinned
# to the host by utils/platform.setup. Checkpointed and resumable.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/logs
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

run() {
  local tag="$1"; shift
  echo "=== $(date +%H:%M:%S) $tag: $*" | tee -a experiments/logs/r3_queue.log
  "$@" >> "experiments/logs/r3_${tag}.log" 2>&1
  local rc=$?  # capture BEFORE $(date) in the echo resets $?
  echo "=== $(date +%H:%M:%S) $tag exit=$rc" | tee -a experiments/logs/r3_queue.log
}

exp() {
  local tag="$1"; shift
  run "$tag" python -m amf_tpu.run.experiment "$@"
}

exp db5to1_mmmf drugbank-94x425-5to1 --only mmmf
exp db5to1_check drugbank-94x425-5to1 --check
run seeds_d2 bash scripts/r3_seeds_scan.sh
exp 58k15d_mmmf movielens-58k-from5pct-test5pct-15d --only mmmf
exp 58k15d_check movielens-58k-from5pct-test5pct-15d --check
echo "=== $(date +%H:%M:%S) PHASE3C DONE" | tee -a experiments/logs/r3_queue.log
