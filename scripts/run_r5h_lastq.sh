#!/usr/bin/env bash
# Round-5 queue H: retag the last pre-tagging-era large-Q rows (Austin
# break Q1000; Birmingham break Q1000 and Q5000/'mult') — the only
# remaining untagged-next-to-tagged units warnings.
set -u
cd "$(dirname "$0")/.."
RUNT() { echo "=== tpu $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --tpu --out-dir results_tpu "$@"; }
RUNT unweighted --mode break --gkb-only --force --Q 1000 --datasets Austin Birmingham
RUNT unweighted --mode break --gkb-only --force --Q 5000 --order mult --datasets Birmingham
python scripts/summarize_results.py
echo "=== r5h queue done ($(date +%H:%M:%S))"
