#!/usr/bin/env bash
# Round-3 final tail: full-candidate-set GKB on the two transports where
# even Q=1000 trails MIOBI (Birmingham -4.55e-3 vs -4.77e-3, Sydney
# -1.99e-3 vs -2.50e-3). MIOBI scores EVERY existing edge each step
# (krylov_miobi.m:43-52 default); Q=m-k gives GKB the same search space —
# the batched scorer makes this affordable (chunked super-tile SpMM).
# Then the remaining budget roster, then the wall-time refresh.
set -u
cd "$(dirname "$0")/.."
export KRT_PROFILE=1
RUN() { echo "=== $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --tpu --out-dir results_tpu "$@"; }

# -- stage 1a: as_735 make with 'mult' candidate order: global
#    centrality-product ranking of missing pairs (the direction MIOBI's
#    eigen-score searches, find_top_missing_edges.m:20-54) exactly scored
#    by the batched Krylov metric — the 'min' order restricts candidates to
#    pairs among the top ~sqrt(2Q) nodes and loses on this hub graph
RUN unweighted --mode make --Q 1000 --gkb-only --order mult --datasets as_735

# -- stage 1b: full-E demonstrations (Q = m - k, exact)
RUN unweighted --mode break --Q 20863 --gkb-only --datasets Birmingham
RUN unweighted --mode break --Q 38737 --gkb-only --datasets Sydney

# -- stage 2: remaining budget sweeps
RUN budget --mode make  --datasets ChicagoRegional
RUN budget --mode break --datasets ChicagoRegional
RUN budget --mode break --datasets Birmingham
RUN budget --mode make  --datasets Birmingham
RUN budget --mode break --datasets Hawaii
RUN budget --mode make  --datasets Hawaii
RUN budget --mode break --datasets RhodeIsland
RUN budget --mode make  --datasets RhodeIsland

# -- stage 3: break GKB wall-time refresh (keyed replace)
RUN unweighted --mode break --gkb-only --force --datasets Rome Austin as_735 DC ca-HepTh ChicagoRegional Philadelphia Birmingham ca-CondMat Sydney RhodeIsland Hawaii soc-Epinions1
echo "=== r3d queue done ($(date +%H:%M:%S))"
