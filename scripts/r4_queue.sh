#!/usr/bin/env bash
# Round-4 chip queue (pre-staged at round-3 end; see ROADMAP.md).
# Run when the accelerator tunnel is back (`ps aux | grep tpu_init` and a
# `timeout 120 python -c "import jax; print(jax.devices())"` probe).
# Strictly sequential — concurrent attaches fail. Every job checkpoints.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/logs
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

run() {
  local tag="$1"; shift
  echo "=== $(date +%H:%M:%S) $tag: $*" | tee -a experiments/logs/r4_queue.log
  "$@" >> "experiments/logs/r4_${tag}.log" 2>&1
  local rc=$?
  echo "=== $(date +%H:%M:%S) $tag exit=$rc" | tee -a experiments/logs/r4_queue.log
}

exp() {
  local tag="$1"; shift
  run "$tag" python -m amf_tpu.run.experiment "$@"
}

# 1. re-record the frozen-era stan curves with the fixed sampler
#    (cost-normalized ESJD warmup — BENCHMARKS.md "NUTS mixing"):
exp 58k15d_stan movielens-58k-from5pct-test5pct-15d --force --only stan
exp 58k15d_check movielens-58k-from5pct-test5pct-15d --check
# 2. the two remaining item-3 runs:
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
echo "=== $(date +%H:%M:%S) R4 QUEUE DONE" | tee -a experiments/logs/r4_queue.log
