#!/usr/bin/env bash
# Multi-seed replicates for the 10x10_d4 bands (VERDICT r2 item 5), same
# pattern as scripts/r3_seeds_scan.sh: the catalog's apmf and mnpmf configs
# (run/experiment.py 10x10_discrete4_d4) via the whole-sweep scan fast path
# on the band keys (pred-variance vs random). f64 -> CPU-pinned, usable
# with the accelerator tunnel down.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments/logs
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

OUT=experiments/10x10_discrete4_d4
L=experiments/logs/r3_seeds_d4.log
for k in 1 2 3 4; do
  d="$OUT/seed$k"
  mkdir -p "$d"
  if [[ ! -f "$d/data.pkl" ]]; then
    python -m amf_tpu.run.generate --rows 10 --cols 10 --rank 4 \
      --known-pos 10 --unknown-pos 90 --cutoff 0 "$d/data.pkl" \
      --seed "$k" >> "$L" 2>&1
  fi
  for model in vn mn; do
    stem=$([[ "$model" == mn ]] && echo mnpmf || echo apmf)
    if [[ ! -f "$d/results_$stem.pkl" ]]; then
      echo "=== $(date +%H:%M:%S) seed$k $stem (scan)" | tee -a "$L"
      timeout 3600 python -m amf_tpu.run.active_pmf --model "$model" \
        --load-data "$d/data.pkl" \
        --latent-d 4 --discrete-integration --refit-lookahead --scan \
        --save-results "$d/results_$stem.pkl" --no-verbose \
        pred-variance random --seed "$k" \
        --note "seed-replicate:$k" >> "$L" 2>&1
    fi
  done
done
echo "=== $(date +%H:%M:%S) aggregate" | tee -a "$L"
python -m amf_tpu.run.experiment 10x10_discrete4_d4 --seeds 4 --check \
  >> "$L" 2>&1
echo "=== $(date +%H:%M:%S) SEEDS D4 DONE exit=$?" | tee -a "$L"
