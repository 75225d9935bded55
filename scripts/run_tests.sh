#!/usr/bin/env bash
# Test runner with documented tiers. The full suite compiles hundreds of XLA
# programs; on a single-CPU box it takes ~20 min sequentially, so it is split
# into chunks that each stay well under pytest-timeout territory and can be
# run independently (CI can fan the chunks out across jobs).
#
#   scripts/run_tests.sh            # quick tier (core ops + API), ~5 min
#   scripts/run_tests.sh full       # everything, sequential chunks
#   scripts/run_tests.sh golden     # just the torch-reference parity tier
#
# Tier definitions live as pytest markers in pyproject.toml:
#   golden  - parity vs /root/reference (spawns torch subprocesses)
#   kernels - Pallas flash/ring kernel suites (long compiles)
#   slow    - parallel/pipeline/decode/serve/multimodal integration
set -euo pipefail
cd "$(dirname "$0")/.."

mode="${1:-quick}"
PYTEST=(python -m pytest -q)

case "$mode" in
  quick)
    "${PYTEST[@]}" tests/ -m "not golden and not kernels and not slow"
    ;;
  golden)
    "${PYTEST[@]}" tests/ -m golden
    ;;
  full)
    # chunked so a contributor sees steady progress and an OOM/timeout in one
    # area doesn't mask the rest; order: fast feedback first
    "${PYTEST[@]}" tests/ -m "not golden and not kernels and not slow"
    "${PYTEST[@]}" tests/ -m kernels
    "${PYTEST[@]}" tests/ -m "slow"
    "${PYTEST[@]}" tests/ -m golden
    ;;
  *)
    echo "usage: $0 [quick|full|golden]" >&2; exit 2
    ;;
esac
