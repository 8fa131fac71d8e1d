#!/usr/bin/env bash
# Budget-sweep protocol (Figures 1-4, test_unweighted_*_budget.m:16-22) —
# CPU-feasible graphs of the reference's 6-transport roster
# (dir indices [3,6,7,9,11,12] = Anaheim Birmingham ChicagoRegional Hawaii
# RhodeIsland Rome; the large four run on TPU via run_budget_tpu.sh).
# k=10..100 read as prefixes of one k=100 run per (dataset, Q, mode);
# keyed ResultLog rows make every invocation resumable.
set -u
cd "$(dirname "$0")/.."
RUN() { echo "=== budget $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments budget "$@"; }

RUN --mode break --datasets Anaheim
RUN --mode make  --datasets Anaheim

# CPU break edge-pick intersections (reference's .dat overlap table,
# test_unweighted_break.m:134-148,157): the 08-18 CPU break goldens predate
# inter_log, so regenerate the small paper graphs into a fresh table dir
# (f64; keyed resume makes this restartable).
echo "=== break intersections rerun ($(date +%H:%M:%S))"
timeout 21600 python -u -m krylov_robustness_tpu.experiments \
    --out-dir results_cpu_rerun unweighted --mode break \
    --datasets london netscience Anaheim Barcelona Edinburgh CollegeMsg yeast Cardiff

RUN --mode break --datasets Rome
RUN --mode make  --datasets Rome
python scripts/summarize_results.py
echo "=== cpu budget queue done ($(date +%H:%M:%S))"
