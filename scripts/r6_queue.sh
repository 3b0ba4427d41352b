#!/usr/bin/env bash
# Chip-queue continuation — the remaining reference-workload arms, in
# priority order. Rewritten from r5_queue.sh for CROSS-SESSION reality:
# raw results/ckpt/data files are gitignored and do NOT survive a fresh
# checkout, so (a) "is this arm done?" is decided by the COMMITTED digest
# (amf_tpu.run.experiment now skips digest-complete arms; --redo forces a
# re-record of the two old-sampler-era stan digests), (b) mtime-vs-era
# freshness checks are meaningless and are gone, and (c) the 58k random-arm
# repair merges at the DIGEST level (scripts/splice_digest_key.py) — the
# pickle it used to merge into no longer exists.
#
# Defenses from the round-3 postmortem:
#   1. STALL WATCHDOG: a job whose log AND experiment artifacts stop
#      changing for >15 min is killed (explicit PID; round 3 saw a client
#      blocked 67 min on a dead relay) and the tunnel is re-probed.
#   2. STOP SENTINEL: `touch /tmp/queue_stop` exits cleanly BEFORE the next
#      job starts (current job finishes/checkpoints). Remove to relaunch.
#
# Launch:
#   rm -f /tmp/queue_stop
#   nohup bash scripts/r6_queue.sh > /tmp/r6_stdout.log 2>&1 & echo $! > /tmp/r6.pid
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/logs
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
QLOG=experiments/logs/r6_queue.log
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

EXP="python -m amf_tpu.run.experiment"

# ---- 1. stan re-records with the fixed ESJD sampler --------------------
# These two digests are the last ones recorded with the frozen-sampler-era
# NUTS (see BENCHMARKS.md "NUTS mixing"); --redo re-records them (resuming
# any same-session checkpoint). db94/58k/75k/newmovies stan digests are
# already fixed-era — the digest skip leaves them alone.
for arm in "db5to1_stan drugbank-94x425-5to1" \
           "100k_stan movielens-100k-from5pct-test5pct"; do
  set -- $arm
  if python - "$2" <<'PY'
import gzip, json, sys
try:
    with gzip.open(f"experiments/{sys.argv[1]}/digest_stan.json.gz", "rt") as f:
        dg = json.load(f)
    sys.exit(0 if str(dg.get("sampler_era", "")).startswith("esjd") else 1)
except FileNotFoundError:
    sys.exit(1)
PY
  then
    echo "=== $1: digest already ESJD-era; skipping" | tee -a "$QLOG"
  else
    run "$1" $EXP "$2" --only stan --redo
  fi
  run "$1_check" $EXP "$2" --check
done

# ---- 2. era-consistent 58k-15d random arm, spliced at the digest level --
D=experiments/movielens-58k-from5pct-test5pct-15d
if python - <<'PY'
import gzip, json, sys
with gzip.open("experiments/movielens-58k-from5pct-test5pct-15d/digest_stan.json.gz", "rt") as f:
    dg = json.load(f)
sys.exit(0 if "spliced" in dg["criteria"].get("random", {}) else 1)
PY
then
  echo "=== 58k random splice already done; skipping" | tee -a "$QLOG"
else
  run 58k15d_data $EXP movielens-58k-from5pct-test5pct-15d --only data-prep-only
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
    run 58k15d_random_splice python scripts/splice_digest_key.py \
      "$D/digest_stan.json.gz" "$D/results_stan_random_fresh.pkl" random
    run 58k15d_random_tidy rm -f "$D/results_stan_random_fresh.pkl" \
      "$D/ckpt_stan_random_fresh.pkl" "$D/digest_stan.json.gz.presplice.bak"
    run 58k15d_recheck $EXP movielens-58k-from5pct-test5pct-15d --check
  fi
fi

# ---- 3. mmmf re-records with the repaired (eigh-SVT) solver -------------
# (their poisoned digests were purged, so the digest skip lets these run)
run newmovies20d_mmmf $EXP movielens-58k-newmovies-10pct-20d --only mmmf
run newmovies20d_check $EXP movielens-58k-newmovies-10pct-20d --check
run 58k15d_mmmf $EXP movielens-58k-from5pct-test5pct-15d --only mmmf
run 58k15d_mmmf_check $EXP movielens-58k-from5pct-test5pct-15d --check

# ---- 4. where do the Gibbs 12 ms/round go? (decides chain-fusion effort)
if [[ ! -f experiments/logs/r5_gibbs_chain_probe.log && \
      ! -f experiments/logs/r6_gibbs_chain_probe.log ]]; then
  run gibbs_chain_probe python scripts/probe_gibbs_chain.py 128
fi

# ---- 5. remainder -------------------------------------------------------
run db70_data $EXP drugbank-70x306-gibbs --only data-prep-only
if [[ ! -f experiments/drugbank-70x306-gibbs/adjudication_noise_floor_expvar.json ]]; then
  run db70_expvar_probe python scripts/adjudicate_noise_floor.py expvar
fi
run 10x10d4_apmf $EXP 10x10_discrete4_d4 --only apmf
run 10x10d4_check $EXP 10x10_discrete4_d4 --check

# ---- 6. db94 stan 4-seed replicates: decide the pred-variance strict-band
# failure (adjudication_learning_drift.json). ~55 min of chip per seed;
# per-seed digests land at the --check, making completed seeds durable.
if [[ ! -f experiments/drugbank-94x425/seed4/digest_stan.json.gz ]]; then
  run db94_stan_seeds $EXP drugbank-94x425 --seeds 4 --only stan
fi
run db94_seeds_check $EXP drugbank-94x425 --seeds 4 --check
run db94_check $EXP drugbank-94x425 --check

# ---- 7. final all-dirs acceptance sweep ---------------------------------
for e in 10x10_discrete2_d2 10x10_discrete4_d4 criteria_10x10_r1 \
         movielens-100k-from5pct-test5pct movielens-75k-from5pct-test5pct \
         movielens-58k-from5pct-test5pct-15d movielens-58k-newmovies-10pct-10d \
         movielens-58k-newmovies-10pct-20d drugbank-94x425 \
         drugbank-94x425-5to1 drugbank-70x306-gibbs; do
  run "check_$e" $EXP "$e" --check
done

echo "=== $(date +%H:%M:%S) R6 QUEUE DONE" | tee -a "$QLOG"
