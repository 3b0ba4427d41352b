#!/usr/bin/env bash
# Round-5 wind-down: after the chip queues stop, record the final perf
# artifacts on a quiet chip, in order of importance. Run from repo root:
#   bash scripts/r5_winddown.sh
# Prereq: no queue running (touch /tmp/queue_stop and wait, or deadline).
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=experiments/logs/r5_winddown.log
mkdir -p experiments/logs

note() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

note "vn decomposition probe (chip)"
timeout 2400 python scripts/probe_vn_decomp.py 2>&1 | tee -a "$LOG"

note "bench.py (headline rows, warm cache)"
timeout 3600 python bench.py 2>&1 | tee -a "$LOG"

note "driver entry compile check"
timeout 1200 python -c "import __graft_entry__ as g; fn,a=g.entry(); import jax; print('entry ok:', jax.jit(fn)(*a).shape)" 2>&1 | tee -a "$LOG"

note "multichip dryrun (8 virtual CPU devices)"
timeout 1200 env JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -c "import __graft_entry__ as g; g.dryrun_multichip(8)" 2>&1 | tee -a "$LOG"

note "WIND-DOWN DONE"
