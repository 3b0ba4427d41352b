#!/usr/bin/env bash
# Round-3 phase 3: prioritized TPU queue (replaces the tail of r3_queue.sh).
#
# Order rationale:
#  1. 70x306 exp-variance noise-floor probe + binary-metric re-runs — the
#     flagship workload must carry the reference's misclassification metric
#     (stan-bpmf/bpmf.py:53-54) and adjudication evidence, not RMSE-on-±1
#     curves that "fail" the strict band for metric reasons.
#  2. 58k-15d stan re-run — the recorded run used the frozen-chain NUTS
#     (see BENCHMARKS.md round-3 mixing note); re-record with the fixed
#     sampler.
#  3. The remaining VERDICT item-3 runs (mmmf resumes, newmovies d=20,
#     75k stan), then phase-2 multi-seed replicates.
# Each job is checkpointed; whatever the wall clock cuts off resumes next
# round.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/logs

# wait for the in-flight 10x10_d4 experiment (if any) to release the chip
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

run db70_expvar_probe python scripts/adjudicate_noise_floor.py expvar
exp db70_binary drugbank-70x306-gibbs --force --only bayes bayes_lookahead
exp db70_check drugbank-70x306-gibbs --check
exp 58k15d_stan movielens-58k-from5pct-test5pct-15d --force --only stan
exp db5to1_mmmf drugbank-94x425-5to1 --only mmmf
exp 58k15d_mmmf movielens-58k-from5pct-test5pct-15d --only mmmf
exp newmovies20d movielens-58k-newmovies-10pct-20d
exp seeds_d2 10x10_discrete2_d2 --seeds 4 --only apmf bayes mmmf rc
exp seeds_d4 10x10_discrete4_d4 --seeds 4 --only apmf mnpmf
exp seeds_db70 drugbank-70x306-gibbs --seeds 3 --only bayes
exp 75k_stan movielens-75k-from5pct-test5pct --only stan
echo "=== $(date +%H:%M:%S) PHASE3 DONE" | tee -a experiments/logs/r3_queue.log
