#!/usr/bin/env bash
# ROUND-5 QUEUE, generation 5 (FINAL) — r14 reordered for end-of-round
# value after measuring the d4 apmf arm's real cost (~16 min per
# lookahead key x 8 remaining => ~2.5 h; its per-pick checkpoint resumes
# for free, so it moves behind the judge-ranked gaps). Order:
#   1. db94 4-seed stan replicates  — adjudicates the ONLY standing
#      hard_ok=False (queued since round 3)
#   2. criteria_10x10_1step stan + 4-seed replicates + violin — minutes
#      each (2-step 10x10 runs), closes VERDICT missing #5
#   3. db94 + db5to1 mnpmf          — the at-scale MN arms (missing #1)
#   4. newmovies-20d mmmf --redo    — replaces the PURGED pre-fix digest
#   5. nm10d plain stan             — missing #3
#   6. 58k-15d + nm10d mmmf, then the rest of the mmmf matrix
#   7. d4 apmf resume, era re-records, 75k bayes
# Every chip CLI checkpoints per pick; retries resume, and re-entry
# compiles hit the persistent XLA cache (~2 min amortized).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/logs
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
QLOG=experiments/logs/r15_queue.log
STALL_SEC=900
# stop launching jobs ~75 min before the round ends so the wind-down
# (scripts/r5_winddown.sh) gets a quiet chip
DEADLINE=${QUEUE_DEADLINE_TS:-$(date -u -d "2026-08-20 18:10" +%s)}
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

# ---- 1. db94 stan 4-seed replicates, 2-key 100-step lite (babysat per
# seed): adjudicates the standing pred-variance strict-band fail
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
done
run db94_seeds_check "$DB" $EXP drugbank-94x425 --seeds 4 --check
run db94_check "$DB" $EXP drugbank-94x425 --check

# ---- 2. criteria_10x10_1step closure (cheap 2-step runs)
run crit1step_stan "$CD" $EXP criteria_10x10_1step_discrete --only stan
run crit1step_check "$CD" $EXP criteria_10x10_1step_discrete --check
run crit1step_seeds "$CD" $EXP criteria_10x10_1step_discrete --seeds 4
run crit1step_seeds_check "$CD" $EXP criteria_10x10_1step_discrete --seeds 4 --check
run crit1step_violin "$CD" python -m amf_tpu.run.compare_firsts \
  --grid-key pred-variance --names apmf mnpmf stan mmmf rc \
  --outdir "$CD/plots" "$CD/seed1" "$CD/seed2" "$CD/seed3" "$CD/seed4"

# ---- 3. MN at reference scale (babysat: checkpointed CLIs)
for a in 1 2 3; do run db94_mnpmf_a${a} "$DB" $EXP drugbank-94x425 --only mnpmf; done
run db94_mnpmf_check "$DB" $EXP drugbank-94x425 --check
for a in 1 2 3; do run db5to1_mnpmf_a${a} "$DB5" $EXP drugbank-94x425-5to1 --only mnpmf; done
run db5to1_mnpmf_check "$DB5" $EXP drugbank-94x425-5to1 --check

# ---- 4. newmovies-20d mmmf re-record (replaces the PURGED gesdd-era digest)
for a in 1 2; do run nm20d_mmmf_a${a} "$NM20" $EXP movielens-58k-newmovies-10pct-20d --only mmmf --redo; done
run nm20d_check "$NM20" $EXP movielens-58k-newmovies-10pct-20d --check

# ---- 5. nm10d plain stan (reference Makefile's nolookahead arm)
for a in 1 2 3; do
  [[ -f "$NM10/results_stan.pkl" ]] && break
  run nm10d_stan_a${a} "$NM10" $EXP movielens-58k-newmovies-10pct-10d --only stan
done
run nm10d_check "$NM10" $EXP movielens-58k-newmovies-10pct-10d --check

# ---- 6. mmmf matrix
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

# ---- 7. 58k-15d mnpmf (largest MN arm; checkpointed, lands if time allows)
for a in 1 2 3; do run 58k15d_mnpmf_a${a} "$D15" $EXP movielens-58k-from5pct-test5pct-15d --only mnpmf; done
run 58k15d_mnpmf_check "$D15" $EXP movielens-58k-from5pct-test5pct-15d --check

# ---- 8. d4 apmf resume (2/15 keys checkpointed) + era re-records + leftovers
for a in 1 2; do run 10x10d4_apmf_a${a} "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --only apmf; done
run 10x10d4_check "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --check
run 10x10d4_stan_redo "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --only stan --redo
run 10x10d4_check2 "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --check
run db5to1_stan_redo "$DB5" $EXP drugbank-94x425-5to1 --only stan --redo
run db5to1_check "$DB5" $EXP drugbank-94x425-5to1 --check
run nm10d_newitems_redo "$NM10" $EXP movielens-58k-newmovies-10pct-10d --only stan_newitems --redo
run nm10d_check2 "$NM10" $EXP movielens-58k-newmovies-10pct-10d --check
run 75k_bayes "$M75K" $EXP movielens-75k-from5pct-test5pct --only bayes
run 75k_check "$M75K" $EXP movielens-75k-from5pct-test5pct --check

echo "=== $(date +%H:%M:%S) R15 QUEUE DONE" | tee -a "$QLOG"
