#!/usr/bin/env bash
# Multi-seed replicates for the 10x10_d2 bands (VERDICT r2 item 5): per
# seed, the catalog's apmf config via the whole-sweep scan fast path and
# the bayes config on its direct keys (the exp-variance MCMC lookahead is
# excluded: ~hours/seed; its single-seed catalog run + oracle value tests
# remain the evidence). Standard results pickles land under seed<k>/ so
# `run.experiment 10x10_discrete2_d2 --seeds 4 --check` aggregates bands
# over seed means. All jobs are f64 -> pinned to CPU by platform.setup, so
# this queue is usable even with the accelerator tunnel down.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/logs
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

OUT=experiments/10x10_discrete2_d2
L=experiments/logs/r3_seeds_scan.log
for k in 1 2 3 4; do
  d="$OUT/seed$k"
  mkdir -p "$d"
  if [[ ! -f "$d/data.pkl" ]]; then
    python -m amf_tpu.run.generate --rows 10 --cols 10 --rank 2 \
      --known-pos 10 --unknown-pos 90 --cutoff 0 "$d/data.pkl" \
      --seed "$k" >> "$L" 2>&1
  fi
  if [[ ! -f "$d/results_apmf.pkl" ]]; then
    echo "=== $(date +%H:%M:%S) seed$k apmf (scan)" | tee -a "$L"
    timeout 3600 python -m amf_tpu.run.active_pmf --load-data "$d/data.pkl" \
      --latent-d 2 --discrete-integration --refit-lookahead --scan \
      --save-results "$d/results_apmf.pkl" --no-verbose \
      pred-variance random --seed "$k" \
      --note "seed-replicate:$k" >> "$L" 2>&1
  fi
  if [[ ! -f "$d/results_bayes.pkl" ]]; then
    echo "=== $(date +%H:%M:%S) seed$k bayes (direct keys)" | tee -a "$L"
    timeout 3600 python -m amf_tpu.run.bayes_pmf --load-data "$d/data.pkl" \
      --latent-d 2 --no-subtract-mean --samps 200 \
      --save-results "$d/results_bayes.pkl" --no-verbose \
      random pred-variance pred prob-ge-3.5 \
      --seed "$k" --note "seed-replicate:$k" >> "$L" 2>&1
  fi
done
echo "=== $(date +%H:%M:%S) aggregate" | tee -a "$L"
python -m amf_tpu.run.experiment 10x10_discrete2_d2 --seeds 4 --check \
  >> "$L" 2>&1
echo "=== $(date +%H:%M:%S) SEEDS DONE exit=$?" | tee -a "$L"
