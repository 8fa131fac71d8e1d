#!/usr/bin/env bash
# Round-4 queue I: retag the last untagged rows sitting next to round-4
# tagged rows (the seven summarize_results partial-tag warnings), by
# force-regenerating them on the current code with units tags. End state:
# ZERO units warnings across every golden table.
set -u
cd "$(dirname "$0")/.."
export KRT_PROFILE=1
RUNC() { echo "=== cpu $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --out-dir results "$@"; }
RUNT() { echo "=== tpu $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --tpu --out-dir results_tpu "$@"; }

RUNC unweighted --mode break --gkb-only --force --Q 1000 --datasets netscience Barcelona Edinburgh
RUNC unweighted --mode break --gkb-only --force --Q 2146 --datasets Edinburgh
RUNT unweighted --mode break --force --datasets Philadelphia Hawaii Sydney
RUNT unweighted --mode break --gkb-only --force --Q 1000 --datasets Hawaii Sydney
RUNT unweighted --mode break --gkb-only --force --Q 5000 --order mult --datasets Sydney
RUNT unweighted --mode make --force --datasets ca-CondMat
python scripts/summarize_results.py
echo "=== r4i queue done ($(date +%H:%M:%S))"
