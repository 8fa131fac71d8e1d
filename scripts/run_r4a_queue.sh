#!/usr/bin/env bash
# Round-4 queue A — the VERDICT r3 punch list's TPU items, in priority order:
#  1. Unit-consistent flagship break table (VERDICT missing #1 / ADVICE high):
#     full --force reruns of the three graphs whose committed rows mix the
#     pre-fix and post-fix sigma-shifted normalizer units, so all three
#     methods per dataset share one f64 host-lane trexp (the reference's
#     single-evaluator invariant, test_unweighted_break.m:93-95).
#  2. ca-CondMat make at Q=1000/'mult' — the as_735-proven recipe for the
#     last make-mode GKB loss (VERDICT missing #2b).
#  3. Sydney break at Q=10000/'mult' — the near-full candidate set of
#     krylov_miobi.m:43-52, the identified fix for the last break-mode GKB
#     loss (VERDICT missing #2a). Checkpointed; resumable.
# Tail: regenerate results/TABLES.md (VERDICT weak #2 — stale artifact).
set -u
cd "$(dirname "$0")/.."
export KRT_PROFILE=1
RUN() { echo "=== $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --tpu --out-dir results_tpu "$@"; }

RUN unweighted --mode break --force --datasets ca-HepTh ca-CondMat ca-AstroPh
python scripts/summarize_results.py
RUN unweighted --mode make --Q 1000 --gkb-only --order mult --datasets ca-CondMat
RUN unweighted --mode break --Q 10000 --gkb-only --order mult --datasets Sydney
python scripts/summarize_results.py
echo "=== r4a queue done ($(date +%H:%M:%S))"
