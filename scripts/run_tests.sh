#!/usr/bin/env bash
# Reliable full-suite runner.
#
# A single-process `pytest tests/` run accumulates XLA:CPU compiler state
# across ~160 jit-heavy tests and has twice segfaulted inside
# backend_compile_and_load near test ~140 (see CLAUDE.md); the module-scoped
# jax.clear_caches() fixture in tests/conftest.py bounds but does not
# eliminate the risk. This script is the documented way to run everything:
# two pytest processes, each well inside the safe envelope, same coverage.
#
# Usage: scripts/run_tests.sh [extra pytest args...]
set -euo pipefail
cd "$(dirname "$0")/.."

args=("-q" "$@")

echo "== tests/test_[a-m]*.py =="
python -m pytest tests/test_[a-m]*.py "${args[@]}"

echo "== tests/test_[n-z]*.py =="
python -m pytest tests/test_[n-z]*.py "${args[@]}"

echo "ALL TESTS PASSED"
