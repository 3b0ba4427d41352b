#!/usr/bin/env bash
# Round-4 chip queue: VERDICT r3 asks, ordered cheapest-and-most-decisive
# first (this host has ONE CPU core and the chip runs one job at a time;
# a naive Makefile order would spend the whole round on the two longest
# re-records and land nothing else). Long checkpointable re-records run
# LAST — they resume across sessions, the cheap decisive artifacts don't
# need to.
#
# Supersedes r6_queue.sh with the round-3 advisor fixes applied:
#   - jobs run in their own process group (setsid); the stall watchdog
#     kills the WHOLE group, so a hung grandchild TPU job cannot survive
#     its parent and keep holding the chip/tunnel (ADVICE r3 medium)
#   - watchdog progress is scoped to the job's own log + experiment dir,
#     not all of experiments/ (ADVICE r3 low); STALL_SEC=1500 covers
#     first-compile queuing at the remote-compile helper
#   - the 58k splice tidies its inputs only AFTER the recheck passes
#     (ADVICE r3 low)
# Era semantics: run-time era stamps + backfilled digests landed first
# (scripts/backfill_era.py); --redo decisions key on digest-recorded eras.
#
# Launch:
#   rm -f /tmp/queue_stop
#   nohup bash scripts/r7_queue.sh > /tmp/r7_stdout.log 2>&1 & echo $! > /tmp/r7.pid
# Stop cleanly between jobs: touch /tmp/queue_stop
# Deadline: no NEW job starts after QUEUE_DEADLINE_TS (epoch secs;
# default now+9h) so the chip is free for the driver's end-of-round bench.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/logs
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
QLOG=experiments/logs/r7_queue.log
# 50 min: first-ever compiles through the remote helper measured up to
# 663 s for ONE program and a job's first step can chain several; killing
# a client mid-compile/dispatch is the known relay-death trigger, so the
# watchdog must out-wait any legitimate compile (the persistent compile
# cache in utils/platform.py makes repeat shapes ~1 s, so this long fuse
# only ever burns on genuinely new shapes or real hangs).
STALL_SEC=3000
DEADLINE=${QUEUE_DEADLINE_TS:-$(( $(date +%s) + 9 * 3600 ))}

# if an earlier queue generation is still running, wait for it
for f in /tmp/r4c.pid /tmp/r4d.pid /tmp/r4e.pid /tmp/r4f.pid /tmp/r5.pid /tmp/r6.pid; do
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

# total utime+stime (ticks) of every process in one process group: an
# additional progress signal for the stall watchdog. Long device-bound
# dispatch loops (e.g. host-tiled criterion maps) can produce NO file
# changes for >STALL_SEC while legitimately computing; a genuinely hung
# client (dead relay: blocked in poll) burns no CPU and still trips the
# fuse. /proc stat field 2 (comm) may contain spaces — split after the
# final ')'.
cpu_of_group() {
  awk -v pg="$1" '
    { i = match($0, /\)[^)]*$/); n = split(substr($0, i + 2), a, " ");
      if (n >= 13 && a[3] == pg) t += a[12] + a[13] }
    END { print t + 0 }' /proc/[0-9]*/stat 2>/dev/null
}

# run <tag> <watch_dir> <cmd...> — job in its own process group, stall
# watchdog scoped to the job log + watch_dir + group CPU time
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
  local log="experiments/logs/r7_${tag}.log"
  setsid "$@" >> "$log" 2>&1 &
  local pid=$!
  local last_change rc cpu_now
  local last_cpu=0
  last_change=$(date +%s)
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    cpu_now=$(cpu_of_group "$pid")
    # >=1 CPU-second since the last progress mark (~3% of one 30 s window):
    # real dispatch loops run >=10%; idle-blocked clients and low-rate
    # heartbeat threads don't clear it
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

# helper: does a digest carry the current engine era?
era_current() {  # era_current <digest.json.gz> <field> <prefix>
  python - "$1" "$2" "$3" <<'PY'
import gzip, json, sys
try:
    with gzip.open(sys.argv[1], "rt") as f:
        dg = json.load(f)
    sys.exit(0 if str(dg.get(sys.argv[2], "")).startswith(sys.argv[3]) else 1)
except FileNotFoundError:
    sys.exit(1)
PY
}

# ---- 1. perf probes (VERDICT #7) — first: their answers steer the round
if [[ ! -f experiments/logs/r5_gibbs_chain_probe.log && \
      ! -f experiments/logs/r6_gibbs_chain_probe.log && \
      ! -f experiments/logs/r7_gibbs_chain_probe.log ]]; then
  run gibbs_chain_probe "$E" python scripts/probe_gibbs_chain.py 128
fi
run db70_data "$E/drugbank-70x306-gibbs" $EXP drugbank-70x306-gibbs --only data-prep-only
if [[ ! -f $E/drugbank-70x306-gibbs/adjudication_noise_floor_expvar.json ]]; then
  run db70_expvar_probe "$E/drugbank-70x306-gibbs" python scripts/adjudicate_noise_floor.py expvar
fi

# ---- 2. cheap catalog arms + 2-step era re-record -----------------------
run 10x10d4_mmmf "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --only mmmf
run 10x10d4_rc "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --only rc
run 10x10d4_check "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --check
if ! era_current "$E/criteria_10x10_r1/digest_stan.json.gz" sampler_era esjd; then
  run criteria_stan "$E/criteria_10x10_r1" $EXP criteria_10x10_r1 --only stan --redo
  run criteria_check "$E/criteria_10x10_r1" $EXP criteria_10x10_r1 --check
fi

# ---- 3. d2 sampler-robustness arms (VERDICT #5) + d2 era-hygiene --------
# straightforward density + s400/s10000 budgets; cross-density τ lands in
# the --check cross-engine rows and scripts/compare_sampler_budgets.py
run d2_straightforward "$E/10x10_discrete2_d2" $EXP 10x10_discrete2_d2 --only stan_straightforward
run d2_s400 "$E/10x10_discrete2_d2" $EXP 10x10_discrete2_d2 --only stan_s400
run d2_s10000 "$E/10x10_discrete2_d2" $EXP 10x10_discrete2_d2 --only stan_s10000
if ! era_current "$E/10x10_discrete2_d2/digest_stan.json.gz" sampler_era esjd; then
  run d2_stan_redo "$E/10x10_discrete2_d2" $EXP 10x10_discrete2_d2 --only stan --redo
fi
if ! era_current "$E/10x10_discrete2_d2/digest_mmmf.json.gz" solver_era eigh; then
  run d2_mmmf_redo "$E/10x10_discrete2_d2" $EXP 10x10_discrete2_d2 --only mmmf --redo
fi
run d2_check "$E/10x10_discrete2_d2" $EXP 10x10_discrete2_d2 --check
run d2_cross_density "$E/10x10_discrete2_d2" python scripts/compare_sampler_budgets.py

# ---- 4. 75k pred noise-floor probe (VERDICT weak #8) ---------------------
# data.npz is gitignored; the standalone probe reads it directly
run 75k_data "$E/movielens-75k-from5pct-test5pct" $EXP movielens-75k-from5pct-test5pct --only data-prep-only
if [[ ! -f $E/movielens-75k-from5pct-test5pct/adjudication_noise_floor_pred.json ]]; then
  run 75k_pred_probe "$E/movielens-75k-from5pct-test5pct" python scripts/adjudicate_75k_pred.py
fi

# ---- 4b. criteria 1step_discrete: the reference's 2-step all-five-family
# comparison workload (results/criteria/10x10_r1_u10_v10_1step_discrete/
# Makefile) — main-dir stan arm (the four CPU arms were run off-queue),
# then 4 seed replicates for the compare_firsts violin grids
CD=$E/criteria_10x10_1step_discrete
run crit1step_stan "$CD" $EXP criteria_10x10_1step_discrete --only stan
run crit1step_check "$CD" $EXP criteria_10x10_1step_discrete --check
run crit1step_seeds "$CD" $EXP criteria_10x10_1step_discrete --seeds 4
run crit1step_seeds_check "$CD" $EXP criteria_10x10_1step_discrete --seeds 4 --check
run crit1step_violin "$CD" python -m amf_tpu.run.compare_firsts \
  --grid-key pred-variance --names apmf mnpmf stan \
  --outdir "$CD/plots" "$CD/seed1" "$CD/seed2" "$CD/seed3" "$CD/seed4"

# ---- 5. era-consistent 58k-15d random arm, spliced at the digest level --
D=$E/movielens-58k-from5pct-test5pct-15d
if python - <<'PY'
import gzip, json, sys
with gzip.open("experiments/movielens-58k-from5pct-test5pct-15d/digest_stan.json.gz", "rt") as f:
    dg = json.load(f)
sys.exit(0 if "spliced" in dg["criteria"].get("random", {}) else 1)
PY
then
  echo "=== 58k random splice already done; skipping" | tee -a "$QLOG"
else
  run 58k15d_data "$D" $EXP movielens-58k-from5pct-test5pct-15d --only data-prep-only
  run 58k15d_random_fresh "$D" python -m amf_tpu.run.bpmf \
    --load-data "$D/data.npz" \
    --latent-d 15 --subtract-mean \
    --samps 200 --warmup 100 \
    --steps 200 --float32 \
    --checkpoint "$D/ckpt_stan_random_fresh.pkl" \
    --save-results "$D/results_stan_random_fresh.pkl" --no-verbose \
    --note "fresh ESJD-sampler random arm for era-consistent comparison" \
    random
  if [[ -f "$D/results_stan_random_fresh.pkl" ]]; then
    run 58k15d_random_splice "$D" python scripts/splice_digest_key.py \
      "$D/digest_stan.json.gz" "$D/results_stan_random_fresh.pkl" random
    if run 58k15d_recheck "$D" $EXP movielens-58k-from5pct-test5pct-15d --check; then
      # tidy ONLY after the recheck passes (ADVICE r3 low)
      run 58k15d_random_tidy "$D" rm -f "$D/results_stan_random_fresh.pkl" \
        "$D/ckpt_stan_random_fresh.pkl" "$D/digest_stan.json.gz.presplice.bak"
    else
      echo "=== 58k15d recheck FAILED; splice inputs kept for inspection" | tee -a "$QLOG"
    fi
  fi
fi

# ---- 6. never-recorded d4 apmf arm (f32 on-chip; the f64 host run
# measured 2.65 min/pick on this 1-core box => ~60 h for 15 keys x 91
# picks, infeasible — stale f64 checkpoint removed so the fresh f32
# recording can't resume mixed-precision picks)
run 10x10d4_apmf_stale_ckpt "$E/10x10_discrete4_d4" rm -f "$E/10x10_discrete4_d4/ckpt_apmf.pkl"
run 10x10d4_apmf "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --only apmf
run 10x10d4_check2 "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --check

# ---- 7. db94 stan 4-seed replicates (VERDICT #3: adjudicate the
# standing strict-band FAIL). ~55 min chip/seed; per-seed digests land at
# the --check, making completed seeds durable.
if [[ ! -f $E/drugbank-94x425/seed4/digest_stan.json.gz ]]; then
  run db94_stan_seeds "$E/drugbank-94x425" $EXP drugbank-94x425 --seeds 4 --only stan
fi
run db94_seeds_check "$E/drugbank-94x425" $EXP drugbank-94x425 --seeds 4 --check
run db94_check "$E/drugbank-94x425" $EXP drugbank-94x425 --check

# ---- 8. mmmf re-records with the repaired (eigh-SVT) solver -------------
run newmovies20d_mmmf "$E/movielens-58k-newmovies-10pct-20d" $EXP movielens-58k-newmovies-10pct-20d --only mmmf
run newmovies20d_check "$E/movielens-58k-newmovies-10pct-20d" $EXP movielens-58k-newmovies-10pct-20d --check
run 58k15d_mmmf "$D" $EXP movielens-58k-from5pct-test5pct-15d --only mmmf
run 58k15d_mmmf_check "$D" $EXP movielens-58k-from5pct-test5pct-15d --check
if ! era_current "$E/drugbank-94x425/digest_mmmf.json.gz" solver_era eigh; then
  run db94_mmmf_redo "$E/drugbank-94x425" $EXP drugbank-94x425 --only mmmf --redo
  run db94_mmmf_check "$E/drugbank-94x425" $EXP drugbank-94x425 --check
fi
if ! era_current "$E/drugbank-94x425-5to1/digest_mmmf.json.gz" solver_era eigh; then
  run db5to1_mmmf_redo "$E/drugbank-94x425-5to1" $EXP drugbank-94x425-5to1 --only mmmf --redo
  run db5to1_mmmf_check "$E/drugbank-94x425-5to1" $EXP drugbank-94x425-5to1 --check
fi

# ---- 9. frozen-era stan re-records (VERDICT #2) — LONG (hours each,
# checkpointed; a later session resumes exactly where the deadline or a
# stop sentinel cut them off). 100k first: its committed digest is the
# known-defective artifact currently certifying hard_ok.
for arm in "100k_stan movielens-100k-from5pct-test5pct" \
           "db5to1_stan drugbank-94x425-5to1"; do
  set -- $arm
  if era_current "$E/$2/digest_stan.json.gz" sampler_era esjd; then
    echo "=== $1: digest already ESJD-era; skipping" | tee -a "$QLOG"
  else
    run "$1" "$E/$2" $EXP "$2" --only stan --redo
    run "$1_check" "$E/$2" $EXP "$2" --check
  fi
done

# ---- 10. remaining catalog arms (VERDICT #4) -----------------------------
run db94_mnpmf "$E/drugbank-94x425" $EXP drugbank-94x425 --only mnpmf
run db94_mnpmf_check "$E/drugbank-94x425" $EXP drugbank-94x425 --check
run db5to1_mnpmf "$E/drugbank-94x425-5to1" $EXP drugbank-94x425-5to1 --only mnpmf
run db5to1_mnpmf_check "$E/drugbank-94x425-5to1" $EXP drugbank-94x425-5to1 --check
run nm10d_stan "$E/movielens-58k-newmovies-10pct-10d" $EXP movielens-58k-newmovies-10pct-10d --only stan
run nm10d_mmmf "$E/movielens-58k-newmovies-10pct-10d" $EXP movielens-58k-newmovies-10pct-10d --only mmmf
run nm10d_check "$E/movielens-58k-newmovies-10pct-10d" $EXP movielens-58k-newmovies-10pct-10d --check
run 100k_mmmf "$E/movielens-100k-from5pct-test5pct" $EXP movielens-100k-from5pct-test5pct --only mmmf
run 100k_check "$E/movielens-100k-from5pct-test5pct" $EXP movielens-100k-from5pct-test5pct --check
run 75k_mmmf "$E/movielens-75k-from5pct-test5pct" $EXP movielens-75k-from5pct-test5pct --only mmmf
run 75k_check "$E/movielens-75k-from5pct-test5pct" $EXP movielens-75k-from5pct-test5pct --check
# the MN model's 472x413 at-scale reason-to-exist (VERDICT missing #2/#3;
# reference Makefile:61-73 results_mnpmf_nolookahead_200steps)
run 58k15d_mnpmf "$D" $EXP movielens-58k-from5pct-test5pct-15d --only mnpmf
run 58k15d_mnpmf_check "$D" $EXP movielens-58k-from5pct-test5pct-15d --check

# ---- 11. remaining era-hygiene re-records --------------------------------
if ! era_current "$E/10x10_discrete4_d4/digest_stan.json.gz" sampler_era esjd; then
  run d4_stan_redo "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --only stan --redo
  run d4_stan_check "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --check
fi
if ! era_current "$E/movielens-58k-newmovies-10pct-10d/digest_stan_newitems.json.gz" sampler_era esjd; then
  run nm10d_newitems_redo "$E/movielens-58k-newmovies-10pct-10d" $EXP movielens-58k-newmovies-10pct-10d --only stan_newitems --redo
  run nm10d_newitems_check "$E/movielens-58k-newmovies-10pct-10d" $EXP movielens-58k-newmovies-10pct-10d --check
fi
# d2 mmmf seed replicates with the repaired solver
if ! era_current "$E/10x10_discrete2_d2/seed4/digest_mmmf.json.gz" solver_era eigh; then
  run d2_mmmf_seeds "$E/10x10_discrete2_d2" $EXP 10x10_discrete2_d2 --seeds 4 --only mmmf --redo
  run d2_mmmf_seeds_check "$E/10x10_discrete2_d2" $EXP 10x10_discrete2_d2 --seeds 4 --check
fi

# ---- 12. final all-dirs acceptance sweep ---------------------------------
for e in 10x10_discrete2_d2 10x10_discrete4_d4 criteria_10x10_r1 \
         movielens-100k-from5pct-test5pct movielens-75k-from5pct-test5pct \
         movielens-58k-from5pct-test5pct-15d movielens-58k-newmovies-10pct-10d \
         movielens-58k-newmovies-10pct-20d drugbank-94x425 \
         drugbank-94x425-5to1 drugbank-70x306-gibbs; do
  run "check_$e" "$E/$e" $EXP "$e" --check
done

echo "=== $(date +%H:%M:%S) R7 QUEUE DONE" | tee -a "$QLOG"
