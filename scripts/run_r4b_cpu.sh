#!/usr/bin/env bash
# Round-4 queue B (CPU f64 lane) — VERDICT r3 items 4 + 8c:
# force-rerun the small-half break/make rows on the ported fused-dispatch +
# banded host-spectra fast path (honest ~>=5x faster times, same picks),
# all three methods per dataset so rows share one fresh tagged normalizer;
# Rome make moves back to the CPU f64 lane for small-half platform
# uniformity (it ran tpu-f32 in round 3).
set -u
cd "$(dirname "$0")/.."
RUN() { echo "=== $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --out-dir results "$@"; }

RUN unweighted --mode break --force --datasets Journals jazz london USAir97 Anaheim Drugs email Barcelona netscience Edinburgh CollegeMsg yeast Cardiff Rome
RUN unweighted --mode make --force --datasets Journals jazz london USAir97 Anaheim Drugs email Barcelona netscience Edinburgh Cardiff yeast CollegeMsg Rome
python scripts/summarize_results.py
echo "=== r4b queue done ($(date +%H:%M:%S))"
