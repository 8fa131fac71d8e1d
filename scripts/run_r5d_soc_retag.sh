#!/usr/bin/env bash
# Round-5 queue D: retag soc-Epinions1's pre-round-4 MIOBI/EIGENV rows by
# rerunning the full break trio (clears the last units warning; GKB on
# the fused lane), then produce the trace_f32_lane golden on the REAL
# TPU (the artifact's platform column records the device lane actually
# exercised — VERDICT r4 item 7).
set -u
cd "$(dirname "$0")/.."
export KRT_PROFILE=1
RUNT() { echo "=== tpu $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --tpu --out-dir results_tpu "$@"; }

RUNT unweighted --mode break --force --fused-steps 10 --datasets soc-Epinions1
echo "=== tpu trace_f32_lane golden ($(date +%H:%M:%S))"
timeout 3000 python -u -c "
import sys; sys.path.insert(0, '/root/repo')
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from krylov_robustness_tpu.experiments.parity import run_trace_f32_lane
run_trace_f32_lane(out_dir='results_tpu')
"
python scripts/summarize_results.py
echo "=== r5d queue done ($(date +%H:%M:%S))"
