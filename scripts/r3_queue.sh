#!/usr/bin/env bash
# Round-3 sequential experiment queue (VERDICT item 3 + new workloads).
# One TPU job at a time; each is checkpointed and resumable.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/logs

run() {
  local tag="$1"; shift
  echo "=== $(date +%H:%M:%S) $tag: $*" | tee -a experiments/logs/r3_queue.log
  python -m amf_tpu.run.experiment "$@" \
    >> "experiments/logs/r3_${tag}.log" 2>&1
  echo "=== $(date +%H:%M:%S) $tag exit=$?" | tee -a experiments/logs/r3_queue.log
}

run 10x10d2_stan 10x10_discrete2_d2 --only stan
run 10x10d2_rc 10x10_discrete2_d2 --only rc --force
run 10x10d4 10x10_discrete4_d4
run db5to1_mmmf drugbank-94x425-5to1 --only mmmf
run 58k15d_mmmf movielens-58k-from5pct-test5pct-15d --only mmmf
run 75k_stan movielens-75k-from5pct-test5pct --only stan
run newmovies20d movielens-58k-newmovies-10pct-20d
echo "=== $(date +%H:%M:%S) QUEUE DONE" | tee -a experiments/logs/r3_queue.log
