# Shared chip-queue harness — source this from r*_queue.sh scripts.
#
# Provides:
#   wait_for_queue_pid <pidfile> <name-regex>  — block while an earlier
#     queue generation is still running (one chip client at a time)
#   wait_for_tpu                               — block until the tunnel
#     answers a jax.devices() probe (give up after 24 failed minutes)
#   run <tag> <watch_dir> <cmd...>             — job in its own process
#     group under a stall watchdog; progress = job log/watch-dir mtime OR
#     group CPU time (long device-bound dispatch loops produce no file
#     changes; a dead-relay hang burns no CPU and trips the fuse); on
#     stall the WHOLE group is killed so a hung grandchild TPU job cannot
#     keep holding the chip/tunnel (ADVICE r3 medium)
#
# Callers must set QLOG (and may override STALL_SEC / DEADLINE) before
# sourcing. Jobs honor the /tmp/queue_stop sentinel and DEADLINE between
# jobs only — a mid-flight job always finishes or stalls out.
STALL_SEC=${STALL_SEC:-3000}
DEADLINE=${DEADLINE:-${QUEUE_DEADLINE_TS:-$(( $(date +%s) + 9 * 3600 ))}}

wait_for_queue_pid() {
  local f="$1" pat="$2" P
  if [[ -f "$f" ]]; then
    P=$(cat "$f")
    if ps -p "$P" -o args= 2>/dev/null | grep -q "$pat"; then
      echo "waiting on live queue pid $P ($f)" | tee -a "$QLOG"
      while kill -0 "$P" 2>/dev/null; do sleep 60; done
    fi
  fi
}

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

# total utime+stime (ticks) of every process in one process group.
# /proc stat field 2 (comm) may contain spaces — split after the final ')'.
cpu_of_group() {
  awk -v pg="$1" '
    { i = match($0, /\)[^)]*$/); n = split(substr($0, i + 2), a, " ");
      if (n >= 13 && a[3] == pg) t += a[12] + a[13] }
    END { print t + 0 }' /proc/[0-9]*/stat 2>/dev/null
}

# One retry for transient tunnel/remote-compile faults: the helper at
# 127.0.0.1:8113 occasionally drops a response mid-read ("response body
# closed before all bytes were read", r9b d2_stan_redo 20:06) and the
# worker sporadically reports UNAVAILABLE; both are retryable — the CLIs
# checkpoint per pick, so a rerun resumes. Deterministic failures do not
# match the signature and are not retried.
_transient_fault() {  # $1 = job log, $2 = byte offset where this attempt began
  # scope the grep to bytes appended by the CURRENT attempt: the per-tag
  # log is cumulative (>>), so fault lines from an earlier attempt or an
  # earlier queue generation must not trigger a retry of a later
  # deterministic failure (ADVICE r4)
  tail -c "+$(( ${2:-0} + 1 ))" "$1" 2>/dev/null | grep -qE \
    'remote_compile: read body|UNAVAILABLE: TPU device error|DEADLINE_EXCEEDED.*remote_compile'
}

run() {
  local tag="$1"; shift
  local watch="$1"; shift
  local log="${QLOG%_queue.log}_${tag}.log"
  local pre_size
  pre_size=$(stat -c %s "$log" 2>/dev/null || echo 0)
  _run_once "$tag" "$watch" "$@"
  local rc=$?
  if (( rc != 0 && rc != 124 )) && _transient_fault "$log" "$pre_size"; then
    echo "=== $(date +%H:%M:%S) $tag transient tunnel fault; retrying once" | tee -a "$QLOG"
    sleep 60
    _run_once "$tag" "$watch" "$@"
    rc=$?
  fi
  return $rc
}

_run_once() {
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
  local log="${QLOG%_queue.log}_${tag}.log"
  setsid "$@" >> "$log" 2>&1 &
  local pid=$!
  local last_change rc cpu_now
  local last_cpu=0
  last_change=$(date +%s)
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    cpu_now=$(cpu_of_group "$pid")
    # >=1 CPU-second within THIS 30 s window (~3%): real dispatch loops
    # run >=10%; idle-blocked clients and heartbeat threads don't clear
    # it. The delta must be per-window, not since-last-progress-mark: a
    # wedged client dripping ~1 CPU-s every few minutes (round-5 100k
    # dispatch hang, 2026-08-20 07:36) crosses any absolute threshold
    # eventually and re-arms the fuse forever.
    if [[ -n "$(find "$watch" "$log" -newermt "@${last_change}" -print -quit 2>/dev/null)" ]] \
       || (( cpu_now > last_cpu + 100 )); then
      last_change=$(date +%s)
    fi
    last_cpu=$cpu_now
    if (( $(date +%s) - last_change > STALL_SEC )); then
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
