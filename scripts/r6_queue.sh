#!/usr/bin/env bash
# Hardened continuation of scripts/r5_queue.sh: identical job list (all jobs
# are skip-if-fresh idempotent, so relaunching re-derives the remaining work),
# plus two defenses the round-3 postmortem showed are needed for an
# unattended multi-hour chip queue:
#
#   1. STALL WATCHDOG: a job whose log AND experiment artifacts stop changing
#      for >15 min is killed (explicit PID) and the queue re-probes the
#      tunnel before moving on. Round 3 observed a client blocked forever in
#      a remote call (67 min, dead relay) — without this, one hang stalls
#      the whole queue for the rest of a session.
#   2. STOP SENTINEL: `touch /tmp/queue_stop` makes the queue exit cleanly
#      BEFORE starting the next job (current job finishes/checkpoints).
#      Remove the sentinel before relaunching.
#
# State machine per stan re-record arm (ESJD-sampler era started 2026-08-18
# 13:00 UTC; MMMF eigh-SVT era 22:36): see r5_queue.sh for the rationale.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/logs
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
QLOG=experiments/logs/r6_queue.log
ERA="2026-08-18 13:00"       # fixed-sampler re-record era (r4c)
MMMF_ERA="2026-08-18 22:36"  # eigh-SVT solver fix commit 207ba42
STALL_SEC=900

# if an earlier queue generation is still running, wait for it
for f in /tmp/r4c.pid /tmp/r4d.pid /tmp/r4e.pid /tmp/r4f.pid /tmp/r5.pid; do
  if [[ -f "$f" ]]; then
    P=$(cat "$f")
    if ps -p "$P" -o args= 2>/dev/null | grep -q "r[456][cdef]*_queue"; then
      echo "waiting on live queue pid $P ($f)" | tee -a "$QLOG"
      while kill -0 "$P" 2>/dev/null; do sleep 60; done
    fi
  fi
done

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

run() {
  local tag="$1"; shift
  if [[ -f /tmp/queue_stop ]]; then
    echo "=== $(date +%H:%M:%S) /tmp/queue_stop present; queue exiting before $tag" | tee -a "$QLOG"
    exit 0
  fi
  wait_for_tpu || exit 1
  echo "=== $(date +%H:%M:%S) $tag: $*" | tee -a "$QLOG"
  local log="experiments/logs/r6_${tag}.log"
  "$@" >> "$log" 2>&1 &
  local pid=$!
  local last_change rc
  last_change=$(date +%s)
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    # progress = the job log or ANY experiment artifact changed recently
    # (checkpoints update every active step; compiles can be silent ~10 min)
    if [[ -n "$(find experiments "$log" -newermt "@${last_change}" -print -quit 2>/dev/null)" ]]; then
      last_change=$(date +%s)
    elif (( $(date +%s) - last_change > STALL_SEC )); then
      echo "=== $(date +%H:%M:%S) $tag STALLED >$((STALL_SEC / 60)) min; killing pid $pid" | tee -a "$QLOG"
      kill "$pid" 2>/dev/null
      sleep 20
      kill -9 "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null
      echo "=== $(date +%H:%M:%S) $tag exit=stalled" | tee -a "$QLOG"
      return 124
    fi
  done
  wait "$pid"; rc=$?
  echo "=== $(date +%H:%M:%S) $tag exit=$rc" | tee -a "$QLOG"
  return $rc
}

fresh() {  # fresh <file> <cutoff>: true if file exists and postdates cutoff
  [[ -n "$(find "$1" -newermt "$2" 2>/dev/null)" ]]
}

# rerecord <tag> <dir> <kind> <era-cutoff> [extra experiment args...]
rerecord() {
  local tag="$1" dir="$2" kind="$3" era="$4"; shift 4
  local res="experiments/$dir/results_${kind}.pkl"
  local ckpt="experiments/$dir/ckpt_${kind}.pkl"
  if fresh "$res" "$era"; then
    echo "=== $tag: $res already re-recorded; skipping" | tee -a "$QLOG"
  else
    rm -f "$res"
    if [[ -e "$ckpt" ]] && ! fresh "$ckpt" "$era"; then
      rm -f "$ckpt"   # pre-era checkpoint would resume the broken-era run
    fi
    run "$tag" python -m amf_tpu.run.experiment "$dir" --only "$kind" "$@"
  fi
  run "${tag}_check" python -m amf_tpu.run.experiment "$dir" --check
}

# ---- stan re-records with the fixed ESJD sampler ----
rerecord db94_stan    drugbank-94x425                  stan "$ERA"
rerecord db5to1_stan  drugbank-94x425-5to1             stan "$ERA"
rerecord 100k_stan    movielens-100k-from5pct-test5pct stan "$ERA"

# ---- era-consistent 58k-15d random arm splice ----
D=experiments/movielens-58k-from5pct-test5pct-15d
if [[ -f "$D/.random_spliced" ]]; then
  echo "=== 58k random splice already done; skipping" | tee -a "$QLOG"
else
  run 58k15d_random_fresh python -m amf_tpu.run.bpmf \
    --load-data "$D/data.npz" \
    --latent-d 15 --subtract-mean \
    --samps 200 --warmup 100 \
    --steps 200 --float32 \
    --checkpoint "$D/ckpt_stan_random_fresh.pkl" \
    --save-results "$D/results_stan_random_fresh.pkl" --no-verbose \
    --note "fresh ESJD-sampler random arm for era-consistent comparison" \
    random
  if [[ -f "$D/results_stan_random_fresh.pkl" ]]; then
    run 58k15d_random_merge python scripts/merge_result_key.py \
      "$D/results_stan.pkl" "$D/results_stan_random_fresh.pkl" random \
      && touch "$D/.random_spliced"
    run 58k15d_random_tidy rm -f "$D/results_stan_random_fresh.pkl" \
      "$D/ckpt_stan_random_fresh.pkl" "$D/results_stan.pkl.premerge.bak"
    run 58k15d_recheck python -m amf_tpu.run.experiment \
      movielens-58k-from5pct-test5pct-15d --check
  fi
fi

# ---- mmmf re-records with the repaired (eigh-SVT) solver ----
rerecord newmovies20d_mmmf movielens-58k-newmovies-10pct-20d   mmmf "$MMMF_ERA"
rerecord 58k15d_mmmf       movielens-58k-from5pct-test5pct-15d mmmf "$MMMF_ERA"

# where do the Gibbs 12 ms/round actually go? (decides chain-fusion effort)
if [[ ! -f experiments/logs/r5_gibbs_chain_probe.log && \
      ! -f experiments/logs/r6_gibbs_chain_probe.log ]]; then
  run gibbs_chain_probe python scripts/probe_gibbs_chain.py 128
fi

# ---- remainder ----
run db70_data python -m amf_tpu.run.experiment drugbank-70x306-gibbs --only data-prep-only
if [[ ! -f experiments/drugbank-70x306-gibbs/adjudication_noise_floor_expvar.json ]]; then
  run db70_expvar_probe python scripts/adjudicate_noise_floor.py expvar
fi
run 10x10d4_apmf python -m amf_tpu.run.experiment 10x10_discrete4_d4 --only apmf

# db94 stan 4-seed replicates: decide the pred-variance strict-band failure
run db94_stan_seeds python -m amf_tpu.run.experiment drugbank-94x425 \
  --seeds 4 --only stan
run db94_seeds_check python -m amf_tpu.run.experiment drugbank-94x425 --check

# final all-dirs acceptance sweep
for e in 10x10_discrete2_d2 10x10_discrete4_d4 criteria_10x10_r1 \
         movielens-100k-from5pct-test5pct movielens-75k-from5pct-test5pct \
         movielens-58k-from5pct-test5pct-15d movielens-58k-newmovies-10pct-10d \
         movielens-58k-newmovies-10pct-20d drugbank-94x425 \
         drugbank-94x425-5to1 drugbank-70x306-gibbs; do
  run "check_$e" python -m amf_tpu.run.experiment "$e" --check
done

echo "=== $(date +%H:%M:%S) R6 QUEUE DONE" | tee -a "$QLOG"
