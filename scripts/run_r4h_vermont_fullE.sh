#!/usr/bin/env bash
# Round-4 queue H: Vermont break at the large-Q/'mult' recipe (beyond-roster;
# the protocol row loses to MIOBI by the known candidate-restriction
# mechanism — close it the same way as Sydney/Philadelphia/Hawaii).
set -u
cd "$(dirname "$0")/.."
export KRT_PROFILE=1
RUN() { echo "=== $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --tpu --out-dir results_tpu "$@"; }

RUN unweighted --mode break --Q 10000 --gkb-only --order mult --datasets Vermont
python scripts/summarize_results.py
echo "=== r4h queue done ($(date +%H:%M:%S))"
