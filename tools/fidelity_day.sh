#!/usr/bin/env bash
# fidelity_day.sh — the one-command weights-day drill (VERDICT r2 task 7).
#
# The single substantive gap of this build is that absolute fidelity vs the
# torch reference (BASELINE bar: keyframes within LPIPS 0.05) cannot be
# measured in the weightless/offline build environment. THE MOMENT a
# weights-enabled environment exists, run this script; every stage is
# already unit-tested dry.
#
# Usage:
#   tools/fidelity_day.sh /path/to/sdxl-turbo-snapshot [goldens.npz]
#
#   snapshot dir: a HF snapshot (unet/ vae/ text_encoder*/ tokenizer*/ ...)
#   goldens.npz : optional — produced ON A CUDA BOX with the reference
#                 installed via:
#                   python tools/check_fidelity.py make-goldens \
#                     --out goldens.npz --model stabilityai/sdxl-turbo
#
# Stages (each independent; failures don't stop later stages):
#   1. tokenizer diff: our BPE vs transformers' CLIPTokenizer(+Fast) on the
#      snapshot's REAL 49,408-entry vocab/merges (tests/test_tokenizer_hf_diff.py)
#   2. LPIPS golden conversion: if tests/golden/ holds the artifacts from
#      tools/dump_lpips_golden.py (run where `lpips` is installed), assert
#      our JAX LPIPS reproduces the package's distances
#   3. real-weight self-check: batched placement policy vs the reference's
#      sequential policy ON THE SNAPSHOT WEIGHTS (NLPD, 0.05 bar)
#   4. the LPIPS-0.05 bar itself: check_fidelity check vs goldens.npz
#      (skipped unless goldens are supplied)
set -u
cd "$(dirname "$0")/.."

SNAPSHOT="${1:?usage: tools/fidelity_day.sh <snapshot-dir> [goldens.npz]}"
GOLDENS="${2:-}"
FAILURES=0

banner() { echo; echo "=== $* ==="; }

banner "stage 1/4: tokenizer diff vs transformers on the real vocab"
if [ -d "$SNAPSHOT/tokenizer" ]; then
  LB_REAL_TOKENIZER_DIR="$SNAPSHOT/tokenizer" \
    python -m pytest tests/test_tokenizer_hf_diff.py -q || FAILURES=$((FAILURES+1))
else
  echo "SKIP: $SNAPSHOT/tokenizer not found"
fi

banner "stage 2/4: LPIPS golden conversion parity"
if [ -f tests/golden/lpips_alex_goldens.json ]; then
  python -m pytest tests/test_lpips_golden.py -q || FAILURES=$((FAILURES+1))
else
  echo "SKIP: tests/golden/lpips_alex_goldens.json absent — produce it where"
  echo "      the lpips package is installed: python tools/dump_lpips_golden.py --out tests/golden"
fi

banner "stage 3/4: batched-policy self-check on real weights (NLPD, 0.05 bar)"
python tools/check_fidelity.py self-check --snapshot "$SNAPSHOT" || FAILURES=$((FAILURES+1))

banner "stage 4/4: LPIPS-0.05 bar vs reference goldens"
if [ -n "$GOLDENS" ] && [ -f "$GOLDENS" ]; then
  python tools/check_fidelity.py check "$GOLDENS" --snapshot "$SNAPSHOT" || FAILURES=$((FAILURES+1))
else
  echo "SKIP: no goldens.npz supplied — produce on a CUDA box with the"
  echo "      reference installed: python tools/check_fidelity.py make-goldens ..."
fi

echo
if [ "$FAILURES" -eq 0 ]; then
  echo "fidelity day: all executed stages PASSED"
else
  echo "fidelity day: $FAILURES stage(s) FAILED"
fi
exit "$FAILURES"
