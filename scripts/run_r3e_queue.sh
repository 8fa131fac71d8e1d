#!/usr/bin/env bash
# Round-3 tail, take 3. Birmingham/Sydney break still trail MIOBI at
# Q=1000/'min'. MIOBI's break score Σ e^λt(1−e^{−2u_t(p)u_t(r)}) is
# monotone in the centrality PRODUCT, i.e. its preferred edges are the
# 'mult' top ranks of find_top_edges (the reference's own default order
# there, find_top_edges.m:14-16). Q=5000/'mult' searches a superset of
# MIOBI's effective picks with exact Krylov scoring at ~1/8 the cost of
# full-E (candidate-chunked scorer, updates/trace_update.py
# MAX_SCORE_CELLS). Then the remaining budget roster, then the wall-time
# refresh.
set -u
cd "$(dirname "$0")/.."
export KRT_PROFILE=1
RUN() { echo "=== $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --tpu --out-dir results_tpu "$@"; }

# -- stage 1: 'mult' large-Q break on the two holdouts
RUN unweighted --mode break --Q 5000 --gkb-only --order mult --datasets Birmingham
RUN unweighted --mode break --Q 5000 --gkb-only --order mult --datasets Sydney

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
echo "=== r3e queue done ($(date +%H:%M:%S))"
