#!/usr/bin/env bash
# Reordered continuation of r9: the two s10000 arms turn out to be ~25x
# the s400 chain length (~4 h each at the measured ~1.6 s/pick for s400),
# so running them next would starve the more decisive full-key density
# arms and the 100k stan era re-record. New order: era-consistent
# full-key density pair (base-stan redo + straightforward) first, then
# the 100k re-record (checkpoint hands to round 5). The s10000 ladder
# moves to scripts/r10_queue.sh (round 5).
#
# Launch:
#   rm -f /tmp/queue_stop
#   nohup bash scripts/r9b_queue.sh > /tmp/r9b_stdout.log 2>&1 &
#   then write the REAL pid to /tmp/r9b.pid:
#   ps -eo pid,args | grep "[r]9b_queue.sh"
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/logs
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
QLOG=experiments/logs/r9b_queue.log
QUEUE_DEADLINE_TS=${QUEUE_DEADLINE_TS:-$(date -d '20:40' +%s)}
source scripts/queue_lib.sh

wait_for_queue_pid /tmp/r9.pid "r9_queue"

EXP="python -m amf_tpu.run.experiment"
D2=experiments/10x10_discrete2_d2

run d2_check_sf400 "$D2" $EXP 10x10_discrete2_d2 --check
run d2_budget_grid "$D2" python scripts/compare_sampler_budgets.py
run d2_stan_redo "$D2" $EXP 10x10_discrete2_d2 --only stan --redo
run d2_check_redo "$D2" $EXP 10x10_discrete2_d2 --check
run d2_straightforward "$D2" $EXP 10x10_discrete2_d2 --only stan_straightforward
run d2_check_sf "$D2" $EXP 10x10_discrete2_d2 --check
run d2_budget_grid2 "$D2" python scripts/compare_sampler_budgets.py

run 100k_stan_redo experiments/movielens-100k-from5pct-test5pct \
  $EXP movielens-100k-from5pct-test5pct --only stan --redo
run 100k_check experiments/movielens-100k-from5pct-test5pct \
  $EXP movielens-100k-from5pct-test5pct --check

echo "=== $(date +%H:%M:%S) R9B QUEUE DONE" | tee -a "$QLOG"
