#!/usr/bin/env bash
# Round-3 reordered tail queue (supersedes the tail of run_r3_queue.sh and
# run_r3b_queue.sh): after the wide-batch scoped-vmem fix
# (ops/pallas_bsr_super.py MAX_B), run the VERDICT-item-3 large-Q
# demonstrations FIRST, then the remaining budget sweeps (item 5), then the
# cosmetic break wall-time refresh last (dropped if the round ends first).
# Everything is keyed-resumable; duplicate rows are impossible (keyed logs).
set -u
cd "$(dirname "$0")/.."
export KRT_PROFILE=1
RUN() { echo "=== $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --tpu --out-dir results_tpu "$@"; }

# -- stage 1: GKB>=MIOBI at large Q (krylov_miobi.m:43-52 — full-E is the
#    reference's own default; Q=250 is the paper's restriction)
RUN unweighted --mode break --Q 1000 --gkb-only --datasets Austin Birmingham Sydney Hawaii
RUN unweighted --mode make  --Q 1000 --gkb-only --datasets as_735

# -- stage 2: remaining budget sweeps (test_unweighted_break_budget.m:16-22)
RUN budget --mode make  --datasets ChicagoRegional
RUN budget --mode break --datasets ChicagoRegional
RUN budget --mode break --datasets Birmingham
RUN budget --mode make  --datasets Birmingham
RUN budget --mode break --datasets Hawaii
RUN budget --mode make  --datasets Hawaii
RUN budget --mode break --datasets RhodeIsland
RUN budget --mode make  --datasets RhodeIsland

# -- stage 3: break GKB wall-time refresh (same protocol, keyed replace;
#    committed rows predate the fused-dispatch step fix)
RUN unweighted --mode break --gkb-only --force --datasets Rome Austin as_735 DC ca-HepTh ChicagoRegional Philadelphia Birmingham ca-CondMat Sydney RhodeIsland Hawaii soc-Epinions1
echo "=== r3c queue done ($(date +%H:%M:%S))"
