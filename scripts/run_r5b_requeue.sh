#!/usr/bin/env bash
# Round-5 queue B: redo the stale-time reruns on the FIXED Sturm kernel
# (the pivot-cascade undercount made the fused lane fall back per-step and
# drift values ~0.5%), and clear the DC/ChicagoRegional units warnings by
# rerunning their full method trios (retag). soc-Epinions1 baselines are
# already tagged — GKB-only there.
set -u
cd "$(dirname "$0")/.."
export KRT_PROFILE=1
RUNT() { echo "=== tpu $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --tpu --out-dir results_tpu "$@"; }

timeout 3000 python scripts/probe_fused_tpu.py coo 20 10
RUNT unweighted --mode break --force --fused-steps 10 --datasets DC ChicagoRegional
RUNT unweighted --mode break --gkb-only --force --fused-steps 10 --datasets soc-Epinions1
python scripts/summarize_results.py
echo "=== r5b queue done ($(date +%H:%M:%S))"
