#!/usr/bin/env bash
# Round-4 queue E: regenerate the budget-sweep goldens on the round-4 fast
# code (first-phase speculative dispatch + banded host spectra). Rows are
# keyed in-place replaced with units tags and honest current wall times;
# old-vs-new tr_variation agreement doubles as a k=100-depth regression
# check of the perf changes.
set -u
cd "$(dirname "$0")/.."
RUNT() { echo "=== tpu $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --tpu --out-dir results_tpu budget --force "$@"; }
RUNC() { echo "=== cpu $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --out-dir results budget --force "$@"; }

RUNC --mode break --datasets Anaheim Rome
RUNC --mode make  --datasets Anaheim Rome
RUNT --mode break --datasets Birmingham ChicagoRegional
RUNT --mode make  --datasets Birmingham ChicagoRegional
RUNT --mode break --datasets Hawaii RhodeIsland
RUNT --mode make  --datasets Hawaii RhodeIsland
python scripts/summarize_results.py
echo "=== r4e queue done ($(date +%H:%M:%S))"
