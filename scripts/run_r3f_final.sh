#!/usr/bin/env bash
# Round-3 final stage (after the budget roster): refresh the four slowest
# round-2-vintage break GKB rows with honest post-fused-dispatch wall
# times (same protocol, keyed in-place replace), then spend the remainder
# of the round on the Sydney Q=10,000 'mult' attempt (the one remaining
# GKB-vs-MIOBI break loss, 3.9% at Q=5000; per-step checkpoints make a
# partial run resumable next round).
set -u
cd "$(dirname "$0")/.."
export KRT_PROFILE=1
RUN() { echo "=== $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --tpu --out-dir results_tpu "$@"; }

RUN unweighted --mode break --gkb-only --force --datasets Birmingham Philadelphia ca-CondMat RhodeIsland

RUN unweighted --mode break --Q 10000 --gkb-only --order mult --datasets Sydney
echo "=== r3f final done ($(date +%H:%M:%S))"
