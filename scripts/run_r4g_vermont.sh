#!/usr/bin/env bash
# Round-4 queue G: Vermont (97,975 nodes / 107,104 nnz) — the reference's
# LARGEST dataset, which its own Tests/*.m protocol never runs — through the
# full Table-2/3 protocol (GKB + MIOBI + EIGENV, k=50, Q=250) on TPU f32.
# A beyond-roster scale demonstration; waits for the budget queue (pid $1)
# to release the chip first.
set -u
cd "$(dirname "$0")/.."
export KRT_PROFILE=1
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
RUN() { echo "=== $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --tpu --out-dir results_tpu "$@"; }

RUN unweighted --mode break --datasets Vermont
RUN unweighted --mode make --datasets Vermont
python scripts/summarize_results.py
echo "=== r4g queue done ($(date +%H:%M:%S))"
