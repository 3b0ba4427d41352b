#!/usr/bin/env bash
# Follow-up chip queue: the two d2 sampler-robustness arms added to the
# catalog after r7 launched (stan_straightforward_s400, stan_s10000_b —
# the reference Makefile's last two uncovered targets), the d2 recheck +
# cross-density/budget comparison refresh, and the never-recorded 75k
# bayes arm.
#
# Harness (watchdog/process-group/stop-sentinel semantics) comes from
# scripts/queue_lib.sh. Waits for r7 to finish first — ONE chip job at a
# time.
#
# Launch:
#   rm -f /tmp/queue_stop
#   nohup bash scripts/r8_queue.sh > /tmp/r8_stdout.log 2>&1 &
#   then write the REAL pid: ps -eo pid,args | grep "[r]8_queue.sh" (the
#   Bash-tool wrapper's $! is the wrapper, not the queue)
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/logs
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
QLOG=experiments/logs/r8_queue.log
source scripts/queue_lib.sh

wait_for_queue_pid /tmp/r7.pid "r7_queue"

EXP="python -m amf_tpu.run.experiment"
E=experiments

run d2_straightforward_s400 "$E/10x10_discrete2_d2" \
  $EXP 10x10_discrete2_d2 --only stan_straightforward_s400
run d2_s10000_b "$E/10x10_discrete2_d2" \
  $EXP 10x10_discrete2_d2 --only stan_s10000_b
run d2_check "$E/10x10_discrete2_d2" $EXP 10x10_discrete2_d2 --check
run d2_cross_density "$E/10x10_discrete2_d2" python scripts/compare_sampler_budgets.py

# 75k bayes: in the catalog since round 2 (VERDICT r3 missing #2's
# "catalog-extra bayes") but never recorded — the only catalog arm with
# neither a committed digest nor a queued job
run 75k_bayes "$E/movielens-75k-from5pct-test5pct" \
  $EXP movielens-75k-from5pct-test5pct --only bayes
run 75k_bayes_check "$E/movielens-75k-from5pct-test5pct" \
  $EXP movielens-75k-from5pct-test5pct --check

echo "=== $(date +%H:%M:%S) R8 QUEUE DONE" | tee -a "$QLOG"
