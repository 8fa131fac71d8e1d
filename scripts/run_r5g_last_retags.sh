#!/usr/bin/env bash
# Round-5 queue G: last vintage cleanups — retag the as_735 make large-Q
# rows (the only remaining untagged-next-to-tagged warning) and refresh
# Vermont's beyond-roster trio + its headline large-Q break row on the
# current production path.
set -u
cd "$(dirname "$0")/.."
RUNT() { echo "=== tpu $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --tpu --out-dir results_tpu "$@"; }

RUNT unweighted --mode make --gkb-only --force --Q 1000 --datasets as_735
RUNT unweighted --mode make --gkb-only --force --Q 1000 --order mult --datasets as_735
RUNT unweighted --mode break --force --datasets Vermont
RUNT unweighted --mode make --force --datasets Vermont
RUNT unweighted --mode break --gkb-only --force --Q 10000 --order mult --datasets Vermont
python scripts/summarize_results.py
echo "=== r5g queue done ($(date +%H:%M:%S))"
