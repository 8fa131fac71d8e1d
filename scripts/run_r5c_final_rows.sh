#!/usr/bin/env bash
# Round-5 queue C: final regeneration of the three refreshed-time rows on
# the corrected fused lane (Sturm pivot fix + gnorm-scaled f32 floor —
# DC k=50 pick-identity vs the per-step lane verified on chip first,
# /tmp/probe_dc.log: identical, 58 ms/step). Full method trios for
# DC/ChicagoRegional (retags their pre-round-4 baseline rows, clearing
# the last two units warnings); GKB-only for soc-Epinions1. Then the
# real-chip sharded-BSR throughput criterion and the device-f32 trace
# golden with the real TPU platform tag.
set -u
cd "$(dirname "$0")/.."
export KRT_PROFILE=1
RUNT() { echo "=== tpu $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --tpu --out-dir results_tpu "$@"; }

RUNT unweighted --mode break --force --fused-steps 10 --datasets DC ChicagoRegional
RUNT unweighted --mode break --gkb-only --force --fused-steps 10 --datasets soc-Epinions1
timeout 3000 python scripts/probe_sharded_bsr_tpu.py
python scripts/summarize_results.py
echo "=== r5c queue done ($(date +%H:%M:%S))"
