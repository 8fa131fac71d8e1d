#!/usr/bin/env bash
# Round-3 correction: the round-2 device-side sigma-shifted trace
# normalizer returned a garbage magnitude on hub graphs (ca-CondMat:
# ~13,070 vs the true trace(exp(A-sigma I)) = 1.0007 — verified against a
# certified top-k eigsh sum). Within-row method comparisons were
# unaffected (same denominator for GKB/MIOBI/EIGENV), but the tr_variation
# magnitudes of the four round-2-vintage shifted break rows are wrong.
# Full --force reruns with the f64 host normalizer lane (funm/trace.py)
# regenerate all three method rows per graph in consistent units.
set -u
cd "$(dirname "$0")/.."
export KRT_PROFILE=1
RUN() { echo "=== $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --tpu --out-dir results_tpu "$@"; }

RUN unweighted --mode break --force --datasets as_735 ca-HepTh ca-CondMat ca-AstroPh

# remainder of the round: the Sydney large-Q attempt (checkpointed)
RUN unweighted --mode break --Q 10000 --gkb-only --order mult --datasets Sydney
echo "=== r3g fix done ($(date +%H:%M:%S))"
