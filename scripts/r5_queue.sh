#!/usr/bin/env bash
# Round-4 kickoff queue: finish everything the round-3 chip queues
# (r4c -> r4d -> r4e -> r4f) did not reach before the round ended.
#
# State machine per stan re-record arm (the ESJD-sampler re-records started
# in r4c at 2026-08-18 13:00 UTC; anything older is the frozen-sampler era):
#   - results_*.pkl newer than the era cutoff  -> already re-recorded; skip
#   - else: rm the stale results + any pre-cutoff checkpoint, run PLAIN
#     (no --force: --force would delete a fresh mid-run checkpoint; plain
#     resumes it, experiment.py:594-603).
# Every job is checkpointed and this script is idempotent — safe to relaunch.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/logs
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
QLOG=experiments/logs/r5_queue.log
ERA="2026-08-18 13:00"       # start of the fixed-sampler re-record era (r4c)
MMMF_ERA="2026-08-18 22:36"  # eigh-SVT solver fix commit 207ba42 (22:35:48);
                             # the 20:02 newmovies-20d results and 21:30
                             # 58k-15d ckpt predate it and are NaN-poisoned

# if a live r4 queue is still running (same-session relaunch), wait for it
for f in /tmp/r4c.pid /tmp/r4d.pid /tmp/r4e.pid /tmp/r4f.pid; do
  if [[ -f "$f" ]]; then
    P=$(cat "$f")
    if ps -p "$P" -o args= 2>/dev/null | grep -q "r4[cdef]_queue"; then
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
    if [ "$tries" -ge 40 ]; then
      echo "=== $(date +%H:%M:%S) tunnel down >2h; queue stopping" | tee -a "$QLOG"
      return 1
    fi
    sleep 60
  done
}

run() {
  local tag="$1"; shift
  wait_for_tpu || exit 1
  echo "=== $(date +%H:%M:%S) $tag: $*" | tee -a "$QLOG"
  "$@" >> "experiments/logs/r5_${tag}.log" 2>&1
  local rc=$?
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

# ---- r4c remainder: stan re-records with the fixed ESJD sampler ----
rerecord db94_stan    drugbank-94x425                  stan "$ERA"
rerecord db5to1_stan  drugbank-94x425-5to1             stan "$ERA"
rerecord 100k_stan    movielens-100k-from5pct-test5pct stan "$ERA"

# ---- r4d: era-consistent 58k-15d random arm splice ----
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

# ---- r4e: mmmf re-records with the repaired (eigh-SVT) solver ----
rerecord newmovies20d_mmmf movielens-58k-newmovies-10pct-20d   mmmf "$MMMF_ERA"
rerecord 58k15d_mmmf       movielens-58k-from5pct-test5pct-15d mmmf "$MMMF_ERA"

# where do the Gibbs 12 ms/round actually go? (decides chain-fusion effort)
if [[ ! -f experiments/logs/r5_gibbs_chain_probe.log ]]; then
  run gibbs_chain_probe python scripts/probe_gibbs_chain.py 128
fi

# ---- r4f remainder ----
run db70_data python -m amf_tpu.run.experiment drugbank-70x306-gibbs --only data-prep-only
if [[ ! -f experiments/drugbank-70x306-gibbs/adjudication_noise_floor_expvar.json ]]; then
  run db70_expvar_probe python scripts/adjudicate_noise_floor.py expvar
fi
run 10x10d4_apmf python -m amf_tpu.run.experiment 10x10_discrete4_d4 --only apmf

# db94 stan 4-seed replicates: decide the pred-variance strict-band failure
# (adjudication_learning_drift.json — drift at the misclass noise floor vs
# real criterion pathology; seed-mean bands are the decisive evidence)
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

echo "=== $(date +%H:%M:%S) R5 QUEUE DONE" | tee -a "$QLOG"
