#!/usr/bin/env bash
# Round-3 phase 4: runs after r3_phase3.sh drains (pass its PID as WAIT_PID).
# - exp-variance noise-floor probe (needs the chip exclusively: the axon
#   plugin rejects concurrent clients)
# - resume the preempted 10x10_d4 apmf arm + re-check that directory
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/logs

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

export PYTHONPATH=/root/repo:${PYTHONPATH:-}
run db70_expvar_probe2 python scripts/adjudicate_noise_floor.py expvar
run db70_check2 python -m amf_tpu.run.experiment drugbank-70x306-gibbs --check
run 10x10d4_resume python -m amf_tpu.run.experiment 10x10_discrete4_d4
echo "=== $(date +%H:%M:%S) PHASE4 DONE" | tee -a experiments/logs/r3_queue.log
