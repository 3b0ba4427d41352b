#!/usr/bin/env bash
# ROUND-5 QUEUE — final-round closure pass, ordered so the three standing
# hard_ok=False verdicts resolve first (VERDICT r4 "next" #1), then the
# missing reference-Makefile arms, then era re-records, then the ~8 h
# s10000 ladder if time remains. Supersedes scripts/r10_queue.sh with:
#   - d2 base-stan --redo REMOVED (its esjd-leapfrog-v1 re-record landed
#     and was committed at the end of round 4 — digest_stan.json.gz
#     carries the fresh era; forcing --redo would burn ~25 chip-min)
#   - d4 stan era re-record ADDED (digest_stan.json.gz in 10x10_discrete4_d4
#     still carries sampler_era=pre-esjd — the one pre-esjd stan digest
#     the r10 ledger section missed)
#   - fresh-checkout aware: raw pickles/ckpts did not survive the round
#     boundary, so long arms start from scratch; everything checkpoints
#     per pick and digests are the durable record.
#
# Launch:
#   rm -f /tmp/queue_stop
#   nohup bash scripts/r11_queue.sh > /tmp/r11_stdout.log 2>&1 &
#   echo the REAL pid: ps -eo pid,args | grep "[r]11_queue.sh"
# Stop cleanly between jobs: touch /tmp/queue_stop
# Set QUEUE_DEADLINE_TS (epoch) so the chip is free for the driver bench.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/logs
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
QLOG=experiments/logs/r11_queue.log
source scripts/queue_lib.sh

wait_for_queue_pid /tmp/r10.pid "r10_queue"

EXP="python -m amf_tpu.run.experiment"
E=experiments
D=$E/movielens-58k-from5pct-test5pct-15d

# ---- 1. era-consistent 58k-15d random arm + digest splice (standing
# MIXED-ERA initial_consistency FAIL since round 3)
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
      run 58k15d_random_tidy "$D" rm -f "$D/results_stan_random_fresh.pkl" \
        "$D/ckpt_stan_random_fresh.pkl" "$D/digest_stan.json.gz.presplice.bak"
    else
      echo "=== 58k15d recheck FAILED; splice inputs kept for inspection" | tee -a "$QLOG"
    fi
  fi
fi

# ---- 2. db94 stan 4-seed replicates (adjudicates the standing strict-band
# hard_ok=False — queued since round 3). --only stan: the fail under
# adjudication is the stan pred-variance strict band; without --only the
# seeds mode would also replicate the mmmf + mnpmf families 4x (days of
# CPU-f64 ADMM), which no open verdict needs.
run db94_seeds "$E/drugbank-94x425" $EXP drugbank-94x425 --seeds 4 --only stan
run db94_seeds_check "$E/drugbank-94x425" $EXP drugbank-94x425 --seeds 4 --check
run db94_check "$E/drugbank-94x425" $EXP drugbank-94x425 --check

# ---- 3. 100k stan era re-record (the last certified frozen-chain artifact;
# starts from scratch this round — checkpoint per pick, stall-watchdogged)
run 100k_stan_redo "$E/movielens-100k-from5pct-test5pct" \
  $EXP movielens-100k-from5pct-test5pct --only stan --redo
run 100k_check "$E/movielens-100k-from5pct-test5pct" \
  $EXP movielens-100k-from5pct-test5pct --check

# ---- 4. cheap 10x10 closure: d4 apmf arm (never recorded) + d4 stan era
# re-record (pre-esjd digest the r10 ledger missed) + d2 mmmf era re-record
run 10x10d4_apmf "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --only apmf
run 10x10d4_stan_redo "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --only stan --redo
run 10x10d4_check "$E/10x10_discrete4_d4" $EXP 10x10_discrete4_d4 --check
run d2_mmmf_redo "$E/10x10_discrete2_d2" $EXP 10x10_discrete2_d2 --only mmmf --redo
run d2_check "$E/10x10_discrete2_d2" $EXP 10x10_discrete2_d2 --check

# ---- 5. MN at reference scale (the model's stated purpose,
# mn_active_pmf.py:119 — zero committed at-scale arms, asked two rounds)
run db94_mnpmf "$E/drugbank-94x425" $EXP drugbank-94x425 --only mnpmf
run db94_mnpmf_check "$E/drugbank-94x425" $EXP drugbank-94x425 --check
run db5to1_mnpmf "$E/drugbank-94x425-5to1" $EXP drugbank-94x425-5to1 --only mnpmf
run db5to1_mnpmf_check "$E/drugbank-94x425-5to1" $EXP drugbank-94x425-5to1 --check
run 58k15d_mnpmf "$D" $EXP movielens-58k-from5pct-test5pct-15d --only mnpmf
run 58k15d_mnpmf_check "$D" $EXP movielens-58k-from5pct-test5pct-15d --check

# ---- 6. mmmf matrix completion: re-records on the eigh-SVT solver + the
# never-recorded reference-Makefile mmmf arms
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
run 100k_mmmf_check "$E/movielens-100k-from5pct-test5pct" \
  $EXP movielens-100k-from5pct-test5pct --check
run 75k_mmmf "$E/movielens-75k-from5pct-test5pct" \
  $EXP movielens-75k-from5pct-test5pct --only mmmf
run 75k_mmmf_check "$E/movielens-75k-from5pct-test5pct" \
  $EXP movielens-75k-from5pct-test5pct --check

# ---- 7. remaining reference-Makefile families
run nm10d_stan "$E/movielens-58k-newmovies-10pct-10d" \
  $EXP movielens-58k-newmovies-10pct-10d --only stan
run nm10d_check "$E/movielens-58k-newmovies-10pct-10d" \
  $EXP movielens-58k-newmovies-10pct-10d --check
run 75k_bayes "$E/movielens-75k-from5pct-test5pct" \
  $EXP movielens-75k-from5pct-test5pct --only bayes
run 75k_bayes_check "$E/movielens-75k-from5pct-test5pct" \
  $EXP movielens-75k-from5pct-test5pct --check

# ---- 8. crit1step stan + seed violin grids (criterion-agreement workload)
CD=$E/criteria_10x10_1step_discrete
run crit1step_stan "$CD" $EXP criteria_10x10_1step_discrete --only stan
run crit1step_check "$CD" $EXP criteria_10x10_1step_discrete --check
run crit1step_seeds "$CD" $EXP criteria_10x10_1step_discrete --seeds 4
run crit1step_seeds_check "$CD" $EXP criteria_10x10_1step_discrete --seeds 4 --check
run crit1step_violin "$CD" python -m amf_tpu.run.compare_firsts \
  --grid-key pred-variance --names apmf mnpmf stan mmmf rc \
  --outdir "$CD/plots" "$CD/seed1" "$CD/seed2" "$CD/seed3" "$CD/seed4"

# ---- 9. remaining pre-esjd stan re-records (era ledger, PARITY.md)
run db5to1_stan_redo "$E/drugbank-94x425-5to1" \
  $EXP drugbank-94x425-5to1 --only stan --redo
run db5to1_check "$E/drugbank-94x425-5to1" $EXP drugbank-94x425-5to1 --check
run nm10d_newitems_redo "$E/movielens-58k-newmovies-10pct-10d" \
  $EXP movielens-58k-newmovies-10pct-10d --only stan_newitems --redo
run nm10d_check2 "$E/movielens-58k-newmovies-10pct-10d" \
  $EXP movielens-58k-newmovies-10pct-10d --check

# ---- 10. mmmf era re-records (pre-eigh-svt digests; long)
run db94_mmmf_redo "$E/drugbank-94x425" $EXP drugbank-94x425 --only mmmf --redo
run db94_check2 "$E/drugbank-94x425" $EXP drugbank-94x425 --check
run db5to1_mmmf_redo "$E/drugbank-94x425-5to1" \
  $EXP drugbank-94x425-5to1 --only mmmf --redo
run db5to1_check2 "$E/drugbank-94x425-5to1" $EXP drugbank-94x425-5to1 --check

# ---- 11. the d2 s10000 sampler-budget ladder (~4 h/arm; only if the
# deadline allows — _run_once exits the queue past DEADLINE)
run d2_s10000 "$E/10x10_discrete2_d2" $EXP 10x10_discrete2_d2 --only stan_s10000
run d2_s10000_b "$E/10x10_discrete2_d2" $EXP 10x10_discrete2_d2 --only stan_s10000_b
run d2_check8b "$E/10x10_discrete2_d2" $EXP 10x10_discrete2_d2 --check
run d2_budget_grid "$E/10x10_discrete2_d2" python scripts/compare_sampler_budgets.py

echo "=== $(date +%H:%M:%S) R11 QUEUE DONE" | tee -a "$QLOG"
