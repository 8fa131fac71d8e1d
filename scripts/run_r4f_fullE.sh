#!/usr/bin/env bash
# Round-4 queue F: two more full-candidate-regime break rows (the Sydney
# recipe) while the budget queue's CPU phase holds the host — demonstrates
# the full-E setting is routine at ~5 s/step after the round-4 dispatch
# work, on two more large transports.
set -u
cd "$(dirname "$0")/.."
export KRT_PROFILE=1
RUN() { echo "=== $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --tpu --out-dir results_tpu "$@"; }

RUN unweighted --mode break --Q 10000 --gkb-only --order mult --datasets Philadelphia
RUN unweighted --mode break --Q 10000 --gkb-only --order mult --datasets Hawaii
echo "=== r4f queue done ($(date +%H:%M:%S))"
