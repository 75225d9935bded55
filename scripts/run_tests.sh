#!/usr/bin/env bash
# Test runner with documented tiers. The full suite compiles hundreds of XLA
# programs; on a single-CPU box it takes ~20 min sequentially, so it is split
# into chunks that each stay well under pytest-timeout territory and can be
# run independently (CI fans the chunks out across matrix jobs —
# .github/workflows/ci.yml).
#
#   scripts/run_tests.sh            # quick tier (core ops + API), ~5 min
#   scripts/run_tests.sh full       # everything, sequential chunks
#   scripts/run_tests.sh golden     # torch-reference parity tier, all chunks
#   scripts/run_tests.sh golden1    # ... just one golden chunk (1-4), <5 min
#
# Tier definitions live as pytest markers in pyproject.toml:
#   golden  - parity vs /root/reference (spawns torch subprocesses)
#   kernels - Pallas flash/ring kernel suites (long compiles)
#   slow    - parallel/pipeline/decode/serve/multimodal integration
#
# Golden chunks are grouped by model family so each fits a <5-min CI slot on
# a single-core host (measured: chunk 1 ~2.1 min, chunk 2 ~1.9 min):
#   golden1 - llama-family + gpt2 end-to-end parity
#   golden2 - explicit engine (mixtral/phi3) + gemma3 + bert parity
#   golden3 - vision (vit/openclip) + rope/window variants + registry
#   golden4 - explicit vendored models + decode/multi-target golden cases
set -euo pipefail
cd "$(dirname "$0")/.."

mode="${1:-quick}"
PYTEST=(python -m pytest -q)

GOLDEN1=(tests/test_parity_llama.py tests/test_parity_gpt2.py)
GOLDEN2=(tests/test_parity_explicit.py tests/test_parity_gemma3.py
         tests/test_parity_bert.py)
GOLDEN3=(tests/test_parity_vit.py tests/test_parity_openclip.py
         tests/test_parity_rope_window.py tests/test_registry_vision.py)
GOLDEN4=(tests/test_explicit_bert.py tests/test_explicit_gpt2.py
         tests/test_explicit_model.py tests/test_decode.py
         tests/test_multi_target.py)

case "$mode" in
  quick)
    "${PYTEST[@]}" tests/ -m "not golden and not kernels and not slow"
    ;;
  kernels)
    "${PYTEST[@]}" tests/ -m kernels
    ;;
  slow)
    "${PYTEST[@]}" tests/ -m slow
    ;;
  golden1) "${PYTEST[@]}" "${GOLDEN1[@]}" -m golden ;;
  golden2) "${PYTEST[@]}" "${GOLDEN2[@]}" -m golden ;;
  golden3) "${PYTEST[@]}" "${GOLDEN3[@]}" -m golden ;;
  golden4) "${PYTEST[@]}" "${GOLDEN4[@]}" -m golden ;;
  golden)
    for c in golden1 golden2 golden3 golden4; do "$0" "$c"; done
    ;;
  full)
    # chunked so a contributor sees steady progress and an OOM/timeout in one
    # area doesn't mask the rest; order: fast feedback first
    "${PYTEST[@]}" tests/ -m "not golden and not kernels and not slow"
    "${PYTEST[@]}" tests/ -m kernels
    "${PYTEST[@]}" tests/ -m "slow"
    "$0" golden
    ;;
  *)
    echo "usage: $0 [quick|kernels|slow|full|golden|golden1..golden4]" >&2
    exit 2
    ;;
esac
