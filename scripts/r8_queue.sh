#!/usr/bin/env bash
# Follow-up chip queue: the two d2 sampler-robustness arms added to the
# catalog after r7 launched (stan_straightforward_s400, stan_s10000_b —
# the reference Makefile's last two uncovered targets), then the d2
# recheck + cross-density/budget comparison refresh.
#
# Same run()/watchdog semantics as r7_queue.sh (process-group kills,
# job-scoped progress watch + group-CPU-time gate, stop sentinel,
# deadline). Waits for r7 to finish first — ONE chip job at a time.
#
# Launch:
#   rm -f /tmp/queue_stop
#   nohup bash scripts/r8_queue.sh > /tmp/r8_stdout.log 2>&1 & echo $! > /tmp/r8.pid
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/logs
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
QLOG=experiments/logs/r8_queue.log
STALL_SEC=3000
DEADLINE=${QUEUE_DEADLINE_TS:-$(( $(date +%s) + 9 * 3600 ))}

if [[ -f /tmp/r7.pid ]]; then
  P=$(cat /tmp/r7.pid)
  if ps -p "$P" -o args= 2>/dev/null | grep -q "r7_queue"; then
    echo "waiting on live r7 queue pid $P" | tee -a "$QLOG"
    while kill -0 "$P" 2>/dev/null; do sleep 60; done
  fi
fi

wait_for_tpu() {
  local tries=0
  while true; do
    if timeout 300 python -c "import jax; jax.devices()" > /dev/null 2>&1; then
      return 0
    fi
    tries=$((tries + 1))
    echo "=== $(date +%H:%M:%S) tunnel probe failed (try $tries)" | tee -a "$QLOG"
    if [ "$tries" -ge 24 ]; then
      echo "=== $(date +%H:%M:%S) tunnel down too long; queue stopping" | tee -a "$QLOG"
      return 1
    fi
    sleep 60
  done
}

cpu_of_group() {
  awk -v pg="$1" '
    { i = match($0, /\)[^)]*$/); n = split(substr($0, i + 2), a, " ");
      if (n >= 13 && a[3] == pg) t += a[12] + a[13] }
    END { print t + 0 }' /proc/[0-9]*/stat 2>/dev/null
}

run() {
  local tag="$1"; shift
  local watch="$1"; shift
  if [[ -f /tmp/queue_stop ]]; then
    echo "=== $(date +%H:%M:%S) /tmp/queue_stop present; queue exiting before $tag" | tee -a "$QLOG"
    exit 0
  fi
  if (( $(date +%s) > DEADLINE )); then
    echo "=== $(date +%H:%M:%S) past deadline; queue exiting before $tag" | tee -a "$QLOG"
    exit 0
  fi
  wait_for_tpu || exit 1
  echo "=== $(date +%H:%M:%S) $tag: $*" | tee -a "$QLOG"
  local log="experiments/logs/r8_${tag}.log"
  setsid "$@" >> "$log" 2>&1 &
  local pid=$!
  local last_change rc cpu_now
  local last_cpu=0
  last_change=$(date +%s)
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    cpu_now=$(cpu_of_group "$pid")
    if [[ -n "$(find "$watch" "$log" -newermt "@${last_change}" -print -quit 2>/dev/null)" ]] \
       || (( cpu_now > last_cpu + 100 )); then
      last_change=$(date +%s)
      last_cpu=$cpu_now
    elif (( $(date +%s) - last_change > STALL_SEC )); then
      echo "=== $(date +%H:%M:%S) $tag STALLED >$((STALL_SEC / 60)) min; killing group $pid" | tee -a "$QLOG"
      kill -- "-$pid" 2>/dev/null
      sleep 20
      kill -9 -- "-$pid" 2>/dev/null
      wait "$pid" 2>/dev/null
      echo "=== $(date +%H:%M:%S) $tag exit=stalled" | tee -a "$QLOG"
      return 124
    fi
  done
  wait "$pid"; rc=$?
  echo "=== $(date +%H:%M:%S) $tag exit=$rc" | tee -a "$QLOG"
  return $rc
}

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
