#!/usr/bin/env bash
# Chip queue 4 (after r4e): rebuild lost raw data deterministically, run the
# db70 exp-variance reliability probe that failed on the missing data.npz,
# record the never-recorded 10x10_d4 apmf arm, then refresh every parity
# report (the digest fallback keeps rows whose raw pickles are gone).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/logs
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
QLOG=experiments/logs/r4_queue.log

if [[ -f /tmp/r4e.pid ]]; then
  P=$(cat /tmp/r4e.pid)
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
  "$@" >> "experiments/logs/r4f_${tag}.log" 2>&1
  local rc=$?
  echo "=== $(date +%H:%M:%S) $tag exit=$rc" | tee -a "$QLOG"
}

# 1. regenerate db70's data.npz (choose_training is seeded; identical bits)
#    without touching its recorded digests: --only with a nonexistent kind
#    runs data prep then skips every model arm
run db70_data python -m amf_tpu.run.experiment drugbank-70x306-gibbs --only data-prep-only
run db70_expvar_probe python scripts/adjudicate_noise_floor.py expvar
run db70_check python -m amf_tpu.run.experiment drugbank-70x306-gibbs --check

# 2. the 10x10_d4 apmf arm was never recorded (reference
#    results/10x10_discrete4_d4/Makefile:68-76)
run 10x10d4_apmf python -m amf_tpu.run.experiment 10x10_discrete4_d4 --only apmf
run 10x10d4_check python -m amf_tpu.run.experiment 10x10_discrete4_d4 --check

# 3. refresh every parity report with the digest fallback in place
for e in 10x10_discrete2_d2 criteria_10x10_r1 movielens-100k-from5pct-test5pct \
         movielens-75k-from5pct-test5pct movielens-58k-from5pct-test5pct-15d \
         movielens-58k-newmovies-10pct-10d movielens-58k-newmovies-10pct-20d \
         drugbank-94x425 drugbank-94x425-5to1; do
  run "check_$e" python -m amf_tpu.run.experiment "$e" --check
done

echo "=== $(date +%H:%M:%S) R4F QUEUE DONE" | tee -a "$QLOG"
