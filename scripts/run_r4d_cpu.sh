#!/usr/bin/env bash
# Round-4 queue D: Cardiff full-candidate-set break (the last GKB-vs-MIOBI
# loss — a 0.013% hairline at protocol Q found by the round-4 full-precision
# scan), then the dense-oracle normalizer audit and table regen.
set -u
cd "$(dirname "$0")/.."
RUN() { echo "=== $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --out-dir results "$@"; }

RUN unweighted --mode break --Q 4394 --gkb-only --datasets Cardiff
python scripts/audit_normalizers.py
python scripts/summarize_results.py
echo "=== r4d queue done ($(date +%H:%M:%S))"
