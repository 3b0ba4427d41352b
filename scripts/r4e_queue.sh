#!/usr/bin/env bash
# Chip queue 3 (after r4d): re-record the two large mmmf arms with the
# repaired solver — eigh-based SVT (the old gesdd SVT NaN'd mid-run on the
# newmovies-20d workload and poisoned every later warm start, pinning
# misclassification at exactly 1.0), NaN cold-restart guard, adaptive rho,
# and the f32 on-chip path (f64 was CPU-pinned: ~4.5 min/step, days per
# 5-selector sweep).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/logs
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
QLOG=experiments/logs/r4_queue.log

if [[ -f /tmp/r4d.pid ]]; then
  P=$(cat /tmp/r4d.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi

wait_for_tpu() {
  local tries=0
  while true; do
    if timeout 300 python -c "import jax; jax.devices()" > /dev/null 2>&1; then
      return 0
    fi
    tries=$((tries + 1))
    echo "=== $(date +%H:%M:%S) tunnel probe failed (try $tries)" | tee -a "$QLOG"
    if [ "$tries" -ge 40 ]; then
      echo "=== $(date +%H:%M:%S) tunnel down >2h; queue stopping" | tee -a "$QLOG"
      return 1
    fi
    sleep 60
  done
}

run() {
  local tag="$1"; shift
  wait_for_tpu || exit 1
  echo "=== $(date +%H:%M:%S) $tag: $*" | tee -a "$QLOG"
  "$@" >> "experiments/logs/r4e_${tag}.log" 2>&1
  local rc=$?
  echo "=== $(date +%H:%M:%S) $tag exit=$rc" | tee -a "$QLOG"
}

exp() {
  local tag="$1"; shift
  run "$tag" python -m amf_tpu.run.experiment "$@"
}

exp newmovies20d_mmmf movielens-58k-newmovies-10pct-20d --force --only mmmf
exp newmovies20d_check movielens-58k-newmovies-10pct-20d --check
exp 58k15d_mmmf movielens-58k-from5pct-test5pct-15d --force --only mmmf
exp 58k15d_check movielens-58k-from5pct-test5pct-15d --check

# on-chip Gibbs chain decomposition (BENCHMARKS.md "Gibbs BPMF at reference
# scale"): where do the 12 ms/round actually go?
run gibbs_chain_probe python scripts/probe_gibbs_chain.py 128

echo "=== $(date +%H:%M:%S) R4E QUEUE DONE" | tee -a "$QLOG"
