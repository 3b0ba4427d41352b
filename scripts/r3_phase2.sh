#!/usr/bin/env bash
# Round-3 phase 2: multi-seed replicates, regression adjudication, digest
# refresh. Run after scripts/r3_queue.sh drains.
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

# multi-seed replicates (VERDICT item 5); stan excluded on cost, the
# cross-family signal comes from apmf/bayes/mmmf/rc (d2) + apmf/mnpmf (d4)
run seeds_d2 10x10_discrete2_d2 --seeds 4 --only apmf bayes mmmf rc
run seeds_d4 10x10_discrete4_d4 --seeds 4 --only apmf mnpmf

# 70x306 pred-variance-vs-random spread (VERDICT item 4 adjudication)
run seeds_db70 drugbank-70x306-gibbs --seeds 3 --only bayes

echo "=== $(date +%H:%M:%S) PHASE2 DONE" | tee -a experiments/logs/r3_queue.log
