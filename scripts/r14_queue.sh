#!/usr/bin/env bash
# ROUND-5 QUEUE, generation 4 — r13 with a babysat 100k re-record. The
# tunnel is wedging dispatch clients stochastically today (~2 wedges in
# 2.5 h: pick ~119 at 06:43, pick ~200 at 07:36 — zero CPU, no
# UNAVAILABLE line, tunnel healthy for fresh clients), so a single
# queued retry cannot carry a ~2.5 h arm. Retry-until-done under the
# per-window CPU stall fuse (queue_lib fix, commit 261088c): each
# attempt resumes the per-pick checkpoint, re-entry compiles are served
# by the persistent XLA cache, so a false-positive kill costs ~2 min.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/logs
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
QLOG=experiments/logs/r14_queue.log
STALL_SEC=900   # picks are ~16 s; 15 min of no-progress is the wedge,
                # while still leaving room for a queued first-shape
                # remote compile (killing mid-compile would forfeit the
                # persistent-cache re-entry that makes retries cheap)
source scripts/queue_lib.sh

EXP="python -m amf_tpu.run.experiment"
E=experiments
D=$E/movielens-58k-from5pct-test5pct-15d
DB=$E/drugbank-94x425
M100K=$E/movielens-100k-from5pct-test5pct

# ---- 1. 100k stan era re-record, babysat to completion
attempt=0
while [[ ! -f "$M100K/results_stan.pkl" ]] && (( attempt < 12 )); do
  attempt=$((attempt + 1))
  run 100k_stan_redo_a${attempt} "$M100K" \
    $EXP movielens-100k-from5pct-test5pct --only stan --redo
done
if [[ ! -f "$M100K/results_stan.pkl" ]]; then
  echo "=== 100k re-record did NOT complete after ${attempt} attempts" | tee -a "$QLOG"
fi
run 100k_check "$M100K" $EXP movielens-100k-from5pct-test5pct --check

# ---- 2. d4 apmf (never recorded)
run 10x10d4_apmf "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --only apmf
run 10x10d4_apmf_b "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --only apmf
run 10x10d4_check "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --check

# ---- 3. db94 seed replicates, 2-key 100-step lite (babysat per seed)
run db94_seed_data "$DB" $EXP drugbank-94x425 --seeds 4 --only data-prep-only
for k in 1 2 3 4; do
  for a in 1 2 3; do
    [[ -f "$DB/seed${k}/results_stan.pkl" ]] && break
    run db94_seed${k}_stan_a${a} "$DB/seed${k}" python -m amf_tpu.run.bpmf \
      --load-data "$DB/seed${k}/data.npz" \
      --latent-d 20 --subtract-mean \
      --samps 200 --warmup 100 \
      --steps 100 --float32 \
      --checkpoint "$DB/seed${k}/ckpt_stan.pkl" \
      --save-results "$DB/seed${k}/results_stan.pkl" --no-verbose \
      --seed ${k} \
      --note "2-key 100-step seed replicate for the pred-variance strict-band adjudication" \
      random pred-variance
  done
  run db94_seeds_check${k} "$DB" $EXP drugbank-94x425 --seeds ${k} --check
done
run db94_check "$DB" $EXP drugbank-94x425 --check

# ---- 4. MN at reference scale (babysat: checkpointed CLIs)
for tag in db94_mnpmf:drugbank-94x425 db5to1_mnpmf:drugbank-94x425-5to1 \
           58k15d_mnpmf:movielens-58k-from5pct-test5pct-15d; do
  name=${tag%%:*}; expname=${tag##*:}
  for a in 1 2 3; do
    run ${name}_a${a} "$E/${expname}" $EXP ${expname} --only mnpmf
  done
  run ${name}_check "$E/${expname}" $EXP ${expname} --check
done

# ---- 5. nm10d plain stan; crit1step stan + f32 seed violins
run nm10d_stan "$E/movielens-58k-newmovies-10pct-10d" \
  $EXP movielens-58k-newmovies-10pct-10d --only stan
run nm10d_stan_b "$E/movielens-58k-newmovies-10pct-10d" \
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

# ---- 6. d4 stan era re-record; remaining arms if time
run 10x10d4_stan_redo "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --only stan --redo
run 10x10d4_check2 "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --check
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
run 100k_mmmf "$M100K" $EXP movielens-100k-from5pct-test5pct --only mmmf
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

echo "=== $(date +%H:%M:%S) R14 QUEUE DONE" | tee -a "$QLOG"
