#!/usr/bin/env bash
# ROUND-5 QUEUE, generation 6 (crash-recovery FINAL) — the r15 session's
# machine was lost before any of its arms could be committed, so every
# r15 target is still open but only ~70 min of chip time remains. This
# generation reorders for minutes-scale decisive arms first:
#   1. crit1step stan + 4-seed replicates + violin  — 2-step 10x10 runs,
#      minutes each; closes VERDICT missing #5 completely
#   2. db94 + db5to1 mnpmf      — the at-scale MN arms (missing #1);
#      direct-key nolookahead runs, the cheapest at-scale family
#   3. nm20d mmmf --redo        — replaces the PURGED gesdd-era digest
#   4. 58k15d / nm10d / db94 / db5to1 / 100k / 75k mmmf matrix
#   5. leftovers (nm10d stan, d4 apmf, 75k bayes) if time allows
# db94 4-seed stan replicates are EXPLICITLY DROPPED from this window:
# each seed is a multi-hour checkpointed stan run; with ~70 min left they
# cannot land, and a partial uncommitted ckpt dies with the machine.
# Idempotent: completed arms are recognized by committed digests.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/logs
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
QLOG=experiments/logs/r16_queue.log
STALL_SEC=900
DEADLINE=${QUEUE_DEADLINE_TS:?set QUEUE_DEADLINE_TS explicitly for this short window}
source scripts/queue_lib.sh

EXP="python -m amf_tpu.run.experiment"
E=experiments
DB=$E/drugbank-94x425
DB5=$E/drugbank-94x425-5to1
D15=$E/movielens-58k-from5pct-test5pct-15d
NM10=$E/movielens-58k-newmovies-10pct-10d
NM20=$E/movielens-58k-newmovies-10pct-20d
M100K=$E/movielens-100k-from5pct-test5pct
M75K=$E/movielens-75k-from5pct-test5pct
CD=$E/criteria_10x10_1step_discrete

# ---- 1. criteria_10x10_1step closure (cheap 2-step runs)
run crit1step_stan "$CD" $EXP criteria_10x10_1step_discrete --only stan
run crit1step_check "$CD" $EXP criteria_10x10_1step_discrete --check
run crit1step_seeds "$CD" $EXP criteria_10x10_1step_discrete --seeds 4
run crit1step_seeds_check "$CD" $EXP criteria_10x10_1step_discrete --seeds 4 --check
run crit1step_violin "$CD" python -m amf_tpu.run.compare_firsts \
  --grid-key pred-variance --names apmf mnpmf stan mmmf rc \
  --outdir "$CD/plots" "$CD/seed1" "$CD/seed2" "$CD/seed3" "$CD/seed4"

# ---- 2. MN at reference scale (checkpointed CLIs; 2 attempts each)
for a in 1 2; do run db94_mnpmf_a${a} "$DB" $EXP drugbank-94x425 --only mnpmf; done
run db94_mnpmf_check "$DB" $EXP drugbank-94x425 --check
for a in 1 2; do run db5to1_mnpmf_a${a} "$DB5" $EXP drugbank-94x425-5to1 --only mnpmf; done
run db5to1_mnpmf_check "$DB5" $EXP drugbank-94x425-5to1 --check

# ---- 3. newmovies-20d mmmf re-record (replaces the PURGED gesdd-era digest)
for a in 1 2; do run nm20d_mmmf_a${a} "$NM20" $EXP movielens-58k-newmovies-10pct-20d --only mmmf --redo; done
run nm20d_check "$NM20" $EXP movielens-58k-newmovies-10pct-20d --check

# ---- 4. mmmf matrix
for a in 1 2; do run 58k15d_mmmf_a${a} "$D15" $EXP movielens-58k-from5pct-test5pct-15d --only mmmf --redo; done
run 58k15d_mmmf_check "$D15" $EXP movielens-58k-from5pct-test5pct-15d --check
for a in 1 2; do run nm10d_mmmf_a${a} "$NM10" $EXP movielens-58k-newmovies-10pct-10d --only mmmf; done
run nm10d_mmmf_check "$NM10" $EXP movielens-58k-newmovies-10pct-10d --check
run db94_mmmf_redo "$DB" $EXP drugbank-94x425 --only mmmf --redo
run db94_mmmf_check "$DB" $EXP drugbank-94x425 --check
run db5to1_mmmf_redo "$DB5" $EXP drugbank-94x425-5to1 --only mmmf --redo
run db5to1_mmmf_check "$DB5" $EXP drugbank-94x425-5to1 --check
run 100k_mmmf "$M100K" $EXP movielens-100k-from5pct-test5pct --only mmmf
run 100k_mmmf_check "$M100K" $EXP movielens-100k-from5pct-test5pct --check
run 75k_mmmf "$M75K" $EXP movielens-75k-from5pct-test5pct --only mmmf
run 75k_mmmf_check "$M75K" $EXP movielens-75k-from5pct-test5pct --check

# ---- 5. leftovers if the window somehow allows
for a in 1 2; do run 58k15d_mnpmf_a${a} "$D15" $EXP movielens-58k-from5pct-test5pct-15d --only mnpmf; done
run 58k15d_mnpmf_check "$D15" $EXP movielens-58k-from5pct-test5pct-15d --check
for a in 1 2; do
  [[ -f "$NM10/results_stan.pkl" ]] && break
  run nm10d_stan_a${a} "$NM10" $EXP movielens-58k-newmovies-10pct-10d --only stan
done
run nm10d_check "$NM10" $EXP movielens-58k-newmovies-10pct-10d --check
run 10x10d4_apmf "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --only apmf
run 10x10d4_check "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --check
run 75k_bayes "$M75K" $EXP movielens-75k-from5pct-test5pct --only bayes
run 75k_check "$M75K" $EXP movielens-75k-from5pct-test5pct --check

echo "=== $(date +%H:%M:%S) R16 QUEUE DONE" | tee -a "$QLOG"
