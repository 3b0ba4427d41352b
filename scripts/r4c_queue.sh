#!/usr/bin/env bash
# Chip queue, take 2 (round 3 cont.): the 13:12 launch of r4_queue.sh
# clobbered PYTHONPATH (dropping /root/.axon_site, whose sitecustomize
# registers the axon TPU backend), so the 58k stan job silently fell back
# to XLA-CPU (~49 s/step vs ~2.5 s/step on-chip, BENCHMARKS.md:152).
# This version (a) RESUMES checkpointed runs instead of --force restarts
# where results were already cleared, and (b) gates every job on a live
# tunnel probe so a dead tunnel pauses the queue instead of burning hours
# of single-core CPU. Strictly sequential — concurrent attaches fail.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/logs
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
QLOG=experiments/logs/r4_queue.log

wait_for_tpu() {
  # Probe until jax sees the chip; a dead tunnel HANGS discovery rather
  # than failing (CLAUDE.md), so bound each probe. The attach itself can
  # take ~3 min under load (measured 18 Aug: import jax + axon init 180 s,
  # then devices() in 0.1 s), so the bound must be generous. ~2h patience.
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
  "$@" >> "experiments/logs/r4c_${tag}.log" 2>&1
  local rc=$?
  echo "=== $(date +%H:%M:%S) $tag exit=$rc" | tee -a "$QLOG"
}

exp() {
  local tag="$1"; shift
  run "$tag" python -m amf_tpu.run.experiment "$@"
}

# 1. resume the fixed-sampler 58k stan re-record (results were cleared by
#    the earlier --force; ckpt_stan.pkl carries random@181/200):
exp 58k15d_stan movielens-58k-from5pct-test5pct-15d --only stan
exp 58k15d_check movielens-58k-from5pct-test5pct-15d --check
# 2. remaining round-2-item-3 runs (resume where checkpointed):
exp 75k_stan movielens-75k-from5pct-test5pct --only stan
exp 75k_check movielens-75k-from5pct-test5pct --check
exp newmovies20d movielens-58k-newmovies-10pct-20d
# 3. finish the CPU-checkpointed arms at chip speed:
exp 58k15d_mmmf movielens-58k-from5pct-test5pct-15d --only mmmf
exp 10x10d4 10x10_discrete4_d4
exp 10x10d4_check 10x10_discrete4_d4 --check
# 4. exp-variance map-reliability probe for the 70x306 adjudication:
run db70_expvar_probe python scripts/adjudicate_noise_floor.py expvar
exp db70_check drugbank-70x306-gibbs --check
# 5. re-record the remaining frozen-sampler-era stan arms (r4b list),
#    increasing cost order:
exp db94_stan drugbank-94x425 --force --only stan
exp db94_check drugbank-94x425 --check
exp db5to1_stan drugbank-94x425-5to1 --force --only stan
exp db5to1_check drugbank-94x425-5to1 --check
exp 100k_stan movielens-100k-from5pct-test5pct --force --only stan
exp 100k_check movielens-100k-from5pct-test5pct --check
echo "=== $(date +%H:%M:%S) R4C QUEUE DONE" | tee -a "$QLOG"
