#!/usr/bin/env bash
# Round-4 queue J: the 10 power-grid countries the paper protocol does NOT
# use, through the exp/L-BFGS weighted suite — beyond-protocol completeness
# (every dataset in the reference repo then has golden rows). Small
# countries first so a round-end kill loses only the largest cells.
set -u
cd "$(dirname "$0")/.."
RUN() { echo "=== $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --out-dir results weighted --fun exp "$@"; }

RUN --countries Belgium Netherlands Switzerland Japan Spain Turkey Great_Britain
RUN --countries USA_Northeast USA_Midwest USA_South
python scripts/summarize_results.py
echo "=== r4j queue done ($(date +%H:%M:%S))"
