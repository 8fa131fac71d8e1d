#!/usr/bin/env bash
# Round-5 queue E: refresh the budget-sweep goldens (Figs 1-4) on the
# fused production lane (now the f32 default) — every time column one
# vintage, 6-11x faster step walls; values keyed-replace their round-4
# rows (same method, current lane). Then a final bench.py validation.
set -u
cd "$(dirname "$0")/.."
export KRT_PROFILE=
RUNT() { echo "=== tpu $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --tpu --out-dir results_tpu "$@"; }

RUNT budget --mode break --force --datasets Anaheim Rome ChicagoRegional Birmingham RhodeIsland Hawaii
RUNT budget --mode make --force --datasets Anaheim Rome ChicagoRegional Birmingham RhodeIsland Hawaii
python scripts/summarize_results.py
echo "=== bench final ($(date +%H:%M:%S))"
timeout 3000 python bench.py
echo "=== r5e queue done ($(date +%H:%M:%S))"
