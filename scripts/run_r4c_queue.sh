#!/usr/bin/env bash
# Round-4 queue C: resume the Sydney full-candidate break run (checkpoint
# step 26) after the tunnel drop killed queue A's last command, then the
# score-reuse demonstration (VERDICT r3 item 6) on the freed chip.
set -u
cd "$(dirname "$0")/.."
export KRT_PROFILE=1
RUN() { echo "=== $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --tpu --out-dir results_tpu "$@"; }

RUN unweighted --mode break --Q 10000 --gkb-only --order mult --datasets Sydney
python scripts/summarize_results.py
echo "=== r4c queue done ($(date +%H:%M:%S))"
