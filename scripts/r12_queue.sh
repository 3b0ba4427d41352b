#!/usr/bin/env bash
# ROUND-5 QUEUE, generation 2 — supersedes r11 after two mid-flight
# corrections (r11 log retained):
#   * db94 4-seed replicates were burning ~12 s/pick x 600 picks/seed
#     because the harness --seeds re-runs the FULL 4-key stan arm; the
#     standing strict-band fail under adjudication is pred-variance vs
#     random, so the replicates here run exactly those TWO keys per seed
#     (300 picks/seed) — 4 genuinely independent seed draws of the
#     quantity being adjudicated for half the chip time.
#   * the r10/r11 "--only mnpmf" jobs for db94/db5to1 and the nm10d
#     stan/mmmf jobs were NO-OPS (no catalog entries); the catalog now
#     carries them (run/experiment.py), mirrored from the reference
#     Makefiles (results_mnpmf_nolookahead_*, results_stan_nolookahead_*,
#     results_mmmf_200steps).
# Order: the two remaining standing-fail closures first (100k frozen-era
# re-record, db94 seed adjudication), then never-recorded arms, then era
# re-records, then the s10000 ladder if time remains.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/logs
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
QLOG=experiments/logs/r12_queue.log
source scripts/queue_lib.sh

wait_for_queue_pid /tmp/r11.pid "r11_queue"

EXP="python -m amf_tpu.run.experiment"
E=experiments
D=$E/movielens-58k-from5pct-test5pct-15d
DB=$E/drugbank-94x425

# ---- 1. 100k stan era re-record (the last certified frozen-chain
# artifact; checkpoints per pick, stall-watchdogged)
run 100k_stan_redo "$E/movielens-100k-from5pct-test5pct" \
  $EXP movielens-100k-from5pct-test5pct --only stan --redo
run 100k_check "$E/movielens-100k-from5pct-test5pct" \
  $EXP movielens-100k-from5pct-test5pct --check

# ---- 2. db94 stan 4-seed replicates, 2-key lite (adjudicates the
# standing pred-variance strict fail; per-seed data draw + chain seed,
# exactly the harness --seeds semantics)
run db94_seed_data "$DB" $EXP drugbank-94x425 --seeds 4 --only data-prep-only
for k in 1 2 3 4; do
  run db94_seed${k}_stan "$DB/seed${k}" python -m amf_tpu.run.bpmf \
    --load-data "$DB/seed${k}/data.npz" \
    --latent-d 20 --subtract-mean \
    --samps 200 --warmup 100 \
    --steps 150 --float32 \
    --checkpoint "$DB/seed${k}/ckpt_stan.pkl" \
    --save-results "$DB/seed${k}/results_stan.pkl" --no-verbose \
    --seed ${k} \
    --note "2-key seed replicate for the pred-variance strict-band adjudication" \
    random pred-variance
done
run db94_seeds_check "$DB" $EXP drugbank-94x425 --seeds 4 --check
run db94_check "$DB" $EXP drugbank-94x425 --check

# ---- 3. cheap 10x10 closure: d4 apmf (never recorded) + d4 stan era
# re-record (pre-esjd)
run 10x10d4_apmf "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --only apmf
run 10x10d4_stan_redo "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --only stan --redo
run 10x10d4_check "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --check

# ---- 4. MN at reference scale (now actually cataloged)
run db94_mnpmf "$DB" $EXP drugbank-94x425 --only mnpmf
run db94_mnpmf_check "$DB" $EXP drugbank-94x425 --check
run db5to1_mnpmf "$E/drugbank-94x425-5to1" $EXP drugbank-94x425-5to1 --only mnpmf
run db5to1_mnpmf_check "$E/drugbank-94x425-5to1" $EXP drugbank-94x425-5to1 --check
run 58k15d_mnpmf "$D" $EXP movielens-58k-from5pct-test5pct-15d --only mnpmf
run 58k15d_mnpmf_check "$D" $EXP movielens-58k-from5pct-test5pct-15d --check

# ---- 5. nm10d plain stan (never recorded; now cataloged)
run nm10d_stan "$E/movielens-58k-newmovies-10pct-10d" \
  $EXP movielens-58k-newmovies-10pct-10d --only stan
run nm10d_check "$E/movielens-58k-newmovies-10pct-10d" \
  $EXP movielens-58k-newmovies-10pct-10d --check

# ---- 6. crit1step stan + seed violin grids (cheap: 2-step runs)
CD=$E/criteria_10x10_1step_discrete
run crit1step_stan "$CD" $EXP criteria_10x10_1step_discrete --only stan
run crit1step_check "$CD" $EXP criteria_10x10_1step_discrete --check
run crit1step_seeds "$CD" $EXP criteria_10x10_1step_discrete --seeds 4
run crit1step_seeds_check "$CD" $EXP criteria_10x10_1step_discrete --seeds 4 --check
run crit1step_violin "$CD" python -m amf_tpu.run.compare_firsts \
  --grid-key pred-variance --names apmf mnpmf stan mmmf rc \
  --outdir "$CD/plots" "$CD/seed1" "$CD/seed2" "$CD/seed3" "$CD/seed4"

# ---- 7. mmmf matrix: re-records on the eigh-SVT solver + never-recorded
# reference-Makefile mmmf arms (long; f32 on-chip)
run newmovies20d_mmmf "$E/movielens-58k-newmovies-10pct-20d" \
  $EXP movielens-58k-newmovies-10pct-20d --only mmmf --redo
run newmovies20d_check "$E/movielens-58k-newmovies-10pct-20d" \
  $EXP movielens-58k-newmovies-10pct-20d --check
run 58k15d_mmmf "$D" $EXP movielens-58k-from5pct-test5pct-15d --only mmmf --redo
run 58k15d_mmmf_check "$D" $EXP movielens-58k-from5pct-test5pct-15d --check
run nm10d_mmmf "$E/movielens-58k-newmovies-10pct-10d" \
  $EXP movielens-58k-newmovies-10pct-10d --only mmmf
run 100k_mmmf "$E/movielens-100k-from5pct-test5pct" \
  $EXP movielens-100k-from5pct-test5pct --only mmmf
run 75k_mmmf "$E/movielens-75k-from5pct-test5pct" \
  $EXP movielens-75k-from5pct-test5pct --only mmmf
run mmmf_checks "$E" $EXP movielens-100k-from5pct-test5pct --check

# ---- 8. remaining families + era re-records
run 75k_bayes "$E/movielens-75k-from5pct-test5pct" \
  $EXP movielens-75k-from5pct-test5pct --only bayes
run 75k_check "$E/movielens-75k-from5pct-test5pct" \
  $EXP movielens-75k-from5pct-test5pct --check
run db5to1_stan_redo "$E/drugbank-94x425-5to1" \
  $EXP drugbank-94x425-5to1 --only stan --redo
run db5to1_check "$E/drugbank-94x425-5to1" $EXP drugbank-94x425-5to1 --check
run nm10d_newitems_redo "$E/movielens-58k-newmovies-10pct-10d" \
  $EXP movielens-58k-newmovies-10pct-10d --only stan_newitems --redo
run nm10d_check2 "$E/movielens-58k-newmovies-10pct-10d" \
  $EXP movielens-58k-newmovies-10pct-10d --check

# ---- 9. mmmf era re-records (pre-eigh-svt; long)
run db94_mmmf_redo "$DB" $EXP drugbank-94x425 --only mmmf --redo
run db94_check2 "$DB" $EXP drugbank-94x425 --check
run db5to1_mmmf_redo "$E/drugbank-94x425-5to1" \
  $EXP drugbank-94x425-5to1 --only mmmf --redo
run db5to1_check2 "$E/drugbank-94x425-5to1" $EXP drugbank-94x425-5to1 --check

# ---- 10. d2 s10000 ladder (~4 h/arm; only if the deadline allows)
run d2_s10000 "$E/10x10_discrete2_d2" $EXP 10x10_discrete2_d2 --only stan_s10000
run d2_s10000_b "$E/10x10_discrete2_d2" $EXP 10x10_discrete2_d2 --only stan_s10000_b
run d2_check10 "$E/10x10_discrete2_d2" $EXP 10x10_discrete2_d2 --check

echo "=== $(date +%H:%M:%S) R12 QUEUE DONE" | tee -a "$QLOG"
