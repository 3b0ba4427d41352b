#!/usr/bin/env bash
# ROUND-5 QUEUE, generation 3 — the post-100k tail, re-planned around the
# measured 100k re-record rate (~24 s/pick x 800 picks ≈ 5 h): a stopper
# halts r12 right after the 100k arm lands, and this queue spends the
# remaining chip time most-closures-first:
#   1. 100k check (certifies the fresh era re-record)
#   2. d4 apmf (the one never-recorded component-inventory arm; ~25 min)
#   3. db94 2-key seed replicates at 100 steps (the seed-mean band
#      aggregates per-seed AUC ratios vs the SAME seed's random arm, so a
#      shorter horizon still adjudicates the pred-variance strict fail;
#      ~40 min/seed — as many seeds as the deadline allows land durably)
#   4. db94 mnpmf (first-ever at-scale MN arm), then db5to1/58k mnpmf
#   5. nm10d plain stan; crit1step stan + f32 seed replicates + violins
#   6. d4 stan era re-record; remaining mmmf/era re-records if time
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/logs
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
QLOG=experiments/logs/r13_queue.log
source scripts/queue_lib.sh

wait_for_queue_pid /tmp/r12.pid "r12_queue"
# the stopper that halted r12 leaves the sentinel behind; clear it or the
# first run() exits immediately
rm -f /tmp/queue_stop

EXP="python -m amf_tpu.run.experiment"
E=experiments
D=$E/movielens-58k-from5pct-test5pct-15d
DB=$E/drugbank-94x425

# ---- 1. 100k stan era re-record: RESUME from the pick ~120 checkpoint.
# The first r12 attempt wedged silently at 06:43 after ~120 picks (the
# round-2/3/4 dispatch-hang fault family: zero CPU, tunnel answers fresh
# clients, no UNAVAILABLE in the log so the signature-based retry cannot
# fire). Queue the arm twice: a second invocation after a mid-flight kill
# resumes the checkpoint; after a completed first run it no-ops on the
# existing pickle. STALL_SEC is 20 min here (picks are ~25 s; silence
# that long is the wedge, not a compile).
STALL_SEC=1500
run 100k_stan_redo "$E/movielens-100k-from5pct-test5pct" \
  $EXP movielens-100k-from5pct-test5pct --only stan --redo
run 100k_stan_redo2 "$E/movielens-100k-from5pct-test5pct" \
  $EXP movielens-100k-from5pct-test5pct --only stan --redo
run 100k_check "$E/movielens-100k-from5pct-test5pct" \
  $EXP movielens-100k-from5pct-test5pct --check

# ---- 2. d4 apmf (never recorded)
run 10x10d4_apmf "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --only apmf
run 10x10d4_check "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --check

# ---- 3. db94 seed replicates, 2-key 100-step lite
run db94_seed_data "$DB" $EXP drugbank-94x425 --seeds 4 --only data-prep-only
for k in 1 2 3 4; do
  run db94_seed${k}_stan "$DB/seed${k}" python -m amf_tpu.run.bpmf \
    --load-data "$DB/seed${k}/data.npz" \
    --latent-d 20 --subtract-mean \
    --samps 200 --warmup 100 \
    --steps 100 --float32 \
    --checkpoint "$DB/seed${k}/ckpt_stan.pkl" \
    --save-results "$DB/seed${k}/results_stan.pkl" --no-verbose \
    --seed ${k} \
    --note "2-key 100-step seed replicate for the pred-variance strict-band adjudication" \
    random pred-variance
  run db94_seeds_check${k} "$DB" $EXP drugbank-94x425 --seeds ${k} --check
done
run db94_check "$DB" $EXP drugbank-94x425 --check

# ---- 4. MN at reference scale
run db94_mnpmf "$DB" $EXP drugbank-94x425 --only mnpmf
run db94_mnpmf_check "$DB" $EXP drugbank-94x425 --check
run db5to1_mnpmf "$E/drugbank-94x425-5to1" $EXP drugbank-94x425-5to1 --only mnpmf
run db5to1_mnpmf_check "$E/drugbank-94x425-5to1" $EXP drugbank-94x425-5to1 --check
run 58k15d_mnpmf "$D" $EXP movielens-58k-from5pct-test5pct-15d --only mnpmf
run 58k15d_mnpmf_check "$D" $EXP movielens-58k-from5pct-test5pct-15d --check

# ---- 5. nm10d plain stan; crit1step stan + f32 seed violins
run nm10d_stan "$E/movielens-58k-newmovies-10pct-10d" \
  $EXP movielens-58k-newmovies-10pct-10d --only stan
run nm10d_check "$E/movielens-58k-newmovies-10pct-10d" \
  $EXP movielens-58k-newmovies-10pct-10d --check
CD=$E/criteria_10x10_1step_discrete
run crit1step_stan "$CD" $EXP criteria_10x10_1step_discrete --only stan
run crit1step_check "$CD" $EXP criteria_10x10_1step_discrete --check
run crit1step_seeds "$CD" $EXP criteria_10x10_1step_discrete --seeds 4
run crit1step_seeds_check "$CD" $EXP criteria_10x10_1step_discrete --seeds 4 --check
run crit1step_violin "$CD" python -m amf_tpu.run.compare_firsts \
  --grid-key pred-variance --names apmf mnpmf stan mmmf rc \
  --outdir "$CD/plots" "$CD/seed1" "$CD/seed2" "$CD/seed3" "$CD/seed4"

# ---- 6. d4 stan era re-record (weakest of the pre-esjd set: retained
# with evidence; re-record only if time allows)
run 10x10d4_stan_redo "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --only stan --redo
run 10x10d4_check2 "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --check

# ---- 7. remaining arms/era re-records, cheapest-decisive first
run 75k_bayes "$E/movielens-75k-from5pct-test5pct" \
  $EXP movielens-75k-from5pct-test5pct --only bayes
run 75k_check "$E/movielens-75k-from5pct-test5pct" \
  $EXP movielens-75k-from5pct-test5pct --check
run newmovies20d_mmmf "$E/movielens-58k-newmovies-10pct-20d" \
  $EXP movielens-58k-newmovies-10pct-20d --only mmmf --redo
run newmovies20d_check "$E/movielens-58k-newmovies-10pct-20d" \
  $EXP movielens-58k-newmovies-10pct-20d --check
run nm10d_mmmf "$E/movielens-58k-newmovies-10pct-10d" \
  $EXP movielens-58k-newmovies-10pct-10d --only mmmf
run 58k15d_mmmf "$D" $EXP movielens-58k-from5pct-test5pct-15d --only mmmf --redo
run 58k15d_mmmf_check "$D" $EXP movielens-58k-from5pct-test5pct-15d --check
run 100k_mmmf "$E/movielens-100k-from5pct-test5pct" \
  $EXP movielens-100k-from5pct-test5pct --only mmmf
run 75k_mmmf "$E/movielens-75k-from5pct-test5pct" \
  $EXP movielens-75k-from5pct-test5pct --only mmmf
run db5to1_stan_redo "$E/drugbank-94x425-5to1" \
  $EXP drugbank-94x425-5to1 --only stan --redo
run db5to1_check "$E/drugbank-94x425-5to1" $EXP drugbank-94x425-5to1 --check
run nm10d_newitems_redo "$E/movielens-58k-newmovies-10pct-10d" \
  $EXP movielens-58k-newmovies-10pct-10d --only stan_newitems --redo
run db94_mmmf_redo "$DB" $EXP drugbank-94x425 --only mmmf --redo
run db5to1_mmmf_redo "$E/drugbank-94x425-5to1" \
  $EXP drugbank-94x425-5to1 --only mmmf --redo

echo "=== $(date +%H:%M:%S) R13 QUEUE DONE" | tee -a "$QLOG"
