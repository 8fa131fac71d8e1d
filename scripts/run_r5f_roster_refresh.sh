#!/usr/bin/env bash
# Round-5 queue F: regenerate the ENTIRE TPU large-half roster (Tables
# 2-3) on the current production path — fused greedy (83-160 ms steps),
# adaptive-k normalizer, retagged trios — so every flagship row carries
# one code vintage for times AND values. DC/ChicagoRegional/soc-Epinions1
# break are already current (queues r5c/r5d) and are skipped. Keyed
# ResultLog + per-dataset checkpoints make this resumable anywhere.
set -u
cd "$(dirname "$0")/.."
RUNT() { echo "=== tpu $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --tpu --out-dir results_tpu "$@"; }

RUNT unweighted --mode break --force --datasets Austin as_735 ca-HepTh Philadelphia Birmingham ca-CondMat Sydney RhodeIsland Hawaii ca-AstroPh
RUNT unweighted --mode make --force --datasets Rome Austin as_735 DC ca-HepTh ChicagoRegional Philadelphia Birmingham ca-CondMat Sydney RhodeIsland Hawaii ca-AstroPh soc-Epinions1
python scripts/summarize_results.py
echo "=== r5f queue done ($(date +%H:%M:%S))"
