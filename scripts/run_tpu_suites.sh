#!/usr/bin/env bash
# TPU golden runner: the large half of the paper's unweighted roster
# (Tables 2-3 protocol, f32 on the real chip). Small graphs have CPU f64
# goldens in results/; these are the graphs the reference cannot reach
# interactively and the framework exists to make tractable.
# Per-dataset greedy checkpoints + keyed ResultLog make every invocation
# resumable; run order is ascending cost so progress accumulates.
set -u
cd "$(dirname "$0")/.."
RUN() { echo "=== $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --tpu --out-dir results_tpu "$@"; }

# Tables 2-3, break (flagship): remaining paper graphs ascending by cost
RUN unweighted --mode break --datasets Austin as_735 DC ca-HepTh ChicagoRegional Philadelphia Birmingham ca-CondMat Sydney RhodeIsland Hawaii ca-AstroPh soc-Epinions1
# Tables 2-3, make: Rome + the same roster
RUN unweighted --mode make --datasets Rome Austin as_735 DC ca-HepTh ChicagoRegional Philadelphia Birmingham ca-CondMat Sydney RhodeIsland Hawaii ca-AstroPh soc-Epinions1
python scripts/summarize_results.py
echo "=== tpu queue done ($(date +%H:%M:%S))"
