#!/usr/bin/env bash
# Round-3 TPU golden queue (VERDICT.md round-2 punch list, items 1-3, 5):
#   1. finish break 22/22 (ca-AstroPh resumes its step-13 checkpoint,
#      soc-Epinions1 fresh) — Tests/test_unweighted_break.m:28-31 roster
#   2. make-mode large half -> 22/22 make rows
#      (Tests/test_unweighted_make.m:28-39, same data_range as break)
#   3. GKB>=MIOBI demonstration: Q=1000 reruns on the roster graphs where
#      Q=250 loses (krylov_miobi.m:43-52 — full-E is the reference default)
#   4. budget sweeps on the 4 missing roster transports
#      (test_unweighted_break_budget.m:16-22)
# Everything is checkpointed/keyed-resumable; ascending cost within stages.
set -u
cd "$(dirname "$0")/.."
export KRT_PROFILE=1
RUN() { echo "=== $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --tpu --out-dir results_tpu "$@"; }

# -- stage 1: break completion
RUN unweighted --mode break --datasets ca-AstroPh soc-Epinions1

# -- stage 2: make-mode large half
RUN unweighted --mode make --datasets Rome Austin as_735 DC ca-HepTh ChicagoRegional Philadelphia Birmingham ca-CondMat Sydney RhodeIsland Hawaii ca-AstroPh soc-Epinions1

# -- stage 3: large-Q GKB rows where Q=250 lost to MIOBI
RUN unweighted --mode break --Q 1000 --gkb-only --datasets Austin Birmingham Sydney Hawaii

# -- stage 4: budget sweeps (ascending cost, break before make)
RUN budget --mode break --datasets ChicagoRegional
RUN budget --mode make  --datasets ChicagoRegional
RUN budget --mode break --datasets Birmingham
RUN budget --mode make  --datasets Birmingham
RUN budget --mode break --datasets Hawaii
RUN budget --mode make  --datasets Hawaii
RUN budget --mode break --datasets RhodeIsland
RUN budget --mode make  --datasets RhodeIsland
echo "=== r3 queue done ($(date +%H:%M:%S))"
