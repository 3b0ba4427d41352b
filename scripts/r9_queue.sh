#!/usr/bin/env bash
# End-of-round-4 reprioritized queue (supersedes the unrun tail of r7/r8).
# ~1h45m of chip time remain before the driver's bench needs the chip, so
# this queue lands the most decisive still-missing artifacts first:
#
#   1. the d2 sampler-robustness arms (VERDICT r3 ask #5) — the reference's
#      own cross-density / sampler-budget consistency grid
#      (results/10x10_discrete2_d2/Makefile:56-125), cheapest-first so a
#      deadline cut still leaves a usable grid; each arm is followed by a
#      --check so its digest lands durably before the next arm starts
#   2. the d2 base-stan era re-record (pre-esjd digest; pairs with the
#      straightforward arm for an era-consistent full-key density τ)
#   3. the 100k stan era re-record (VERDICT r3 weak #3: the committed
#      digest is frozen-era, flat at err 1.216) — LAST because it cannot
#      finish in the window; it checkpoints per pick and round 5 resumes it
#
# Launch:
#   rm -f /tmp/queue_stop
#   nohup bash scripts/r9_queue.sh > /tmp/r9_stdout.log 2>&1 &
#   then write the REAL pid: ps -eo pid,args | grep "[r]9_queue.sh"
# Stop cleanly between jobs: touch /tmp/queue_stop
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/logs
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
QLOG=experiments/logs/r9_queue.log
# no NEW job after 20:40 UTC — the wind-down window (ROADMAP.md LIVE STATE)
QUEUE_DEADLINE_TS=${QUEUE_DEADLINE_TS:-$(date -d '20:40' +%s)}
source scripts/queue_lib.sh

wait_for_queue_pid /tmp/r7.pid "r7_queue"
wait_for_queue_pid /tmp/r8.pid "r8_queue"

EXP="python -m amf_tpu.run.experiment"
D2=experiments/10x10_discrete2_d2

run d2_s400 "$D2" $EXP 10x10_discrete2_d2 --only stan_s400
run d2_check1 "$D2" $EXP 10x10_discrete2_d2 --check
run d2_straightforward_s400 "$D2" $EXP 10x10_discrete2_d2 --only stan_straightforward_s400
run d2_check2 "$D2" $EXP 10x10_discrete2_d2 --check
run d2_s10000 "$D2" $EXP 10x10_discrete2_d2 --only stan_s10000
run d2_s10000_b "$D2" $EXP 10x10_discrete2_d2 --only stan_s10000_b
run d2_check3 "$D2" $EXP 10x10_discrete2_d2 --check
run d2_cross_density "$D2" python scripts/compare_sampler_budgets.py
run d2_stan_redo "$D2" $EXP 10x10_discrete2_d2 --only stan --redo
run d2_straightforward "$D2" $EXP 10x10_discrete2_d2 --only stan_straightforward
run d2_check4 "$D2" $EXP 10x10_discrete2_d2 --check
run d2_cross_density2 "$D2" python scripts/compare_sampler_budgets.py

# 100k stan era re-record: checkpoints per pick; round 5 resumes the ckpt
run 100k_stan_redo experiments/movielens-100k-from5pct-test5pct \
  $EXP movielens-100k-from5pct-test5pct --only stan --redo
run 100k_check experiments/movielens-100k-from5pct-test5pct \
  $EXP movielens-100k-from5pct-test5pct --check

echo "=== $(date +%H:%M:%S) R9 QUEUE DONE" | tee -a "$QLOG"
