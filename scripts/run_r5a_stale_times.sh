#!/usr/bin/env bash
# Round-5 queue A: refresh the three stale-vintage flagship time rows
# (VERDICT r4 item 3). DC 872.8s / ChicagoRegional 629.3s /
# soc-Epinions1 732.4s are pre-round-4-fast-path GKB rows carried over;
# rerun them on the current production lane (fused multi-step blocks,
# optimize/fused.py) so the flagship table's time column is one vintage.
# --gkb-only keyed replace keeps the MIOBI/EIGENV rows untouched; picks
# must stay unchanged (units audit stays 0 BAD). Then the device-f32
# trace lane golden on the real chip (VERDICT item 7 real-device tag).
set -u
cd "$(dirname "$0")/.."
export KRT_PROFILE=1
RUNT() { echo "=== tpu $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --tpu --out-dir results_tpu "$@"; }

RUNT unweighted --mode break --gkb-only --force --fused-steps 10 --datasets DC ChicagoRegional soc-Epinions1
python scripts/summarize_results.py
echo "=== r5a queue done ($(date +%H:%M:%S))"
