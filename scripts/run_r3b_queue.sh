#!/usr/bin/env bash
# Round-3 follow-up TPU queue (runs after run_r3_queue.sh):
#   A. large-Q GKB rerun in MAKE mode where the paper-protocol Q=250
#      candidate restriction loses to MIOBI (krylov_miobi.m:43-52 — the
#      reference's own default is the full candidate set). Roster filled
#      from the stage-2 results: as_735 (GKB 1.14 vs MIOBI 2.31).
#   B. wall-time refresh of the TPU break GKB rows: the committed rows
#      predate the fused-dispatch greedy step (round-2 vintage, 600-1400 s);
#      --force regenerates them in place at the same protocol with honest
#      current times (make-mode rows of the same graphs run 57-96 s).
set -u
cd "$(dirname "$0")/.."
export KRT_PROFILE=1
RUN() { echo "=== $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --tpu --out-dir results_tpu "$@"; }

# -- stage 0: redo of r3-queue work lost to the wide-batch scoped-vmem OOM
#    (fixed in ops/pallas_bsr_super.py MAX_B chunking): the Q=1000 break
#    reruns, and the ChicagoRegional break budget Q=1000 sweep (Q=50/250
#    rows exist; the keyed resume runs only the missing sweep)
RUN unweighted --mode break --Q 1000 --gkb-only --datasets Austin Birmingham Sydney Hawaii
RUN budget --mode break --datasets ChicagoRegional

# -- stage A: make-mode large-Q demonstrations
RUN unweighted --mode make --Q 1000 --gkb-only --datasets as_735

# -- stage B: break GKB wall-time refresh (same protocol, keyed replace)
RUN unweighted --mode break --gkb-only --force --datasets Rome Austin as_735 DC ca-HepTh ChicagoRegional Philadelphia Birmingham ca-CondMat Sydney RhodeIsland Hawaii soc-Epinions1
echo "=== r3b queue done ($(date +%H:%M:%S))"
