#!/usr/bin/env bash
# Golden-result reproduction runner (CPU float64, paper protocol).
# Mirrors the reference's Tests/*.m drivers via the experiments CLI.
# Usage: scripts/run_golden_suites.sh [weighted|unweighted]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD
RUN() { echo "=== $* ($(date +%H:%M:%S))"; timeout 14400 python -m krylov_robustness_tpu.experiments "$@"; }

if [ "${1:-all}" != "unweighted" ]; then
  # Tables 5-6: weighted IPM suites (10 power-grid countries x 3 methods)
  RUN weighted --fun sinh
  RUN weighted --fun cosh
  RUN weighted --fun exp --hessian
  RUN weighted --fun sinh --hessian
  RUN weighted --fun cosh --hessian
fi

if [ "${1:-all}" != "weighted" ]; then
  # Tables 2-3: unweighted break/make (small->large paper graphs)
  RUN unweighted --mode break --datasets Journals jazz london USAir97 Anaheim Drugs email Barcelona netscience Edinburgh CollegeMsg yeast Cardiff Rome
  RUN unweighted --mode make --datasets Journals jazz london USAir97 Anaheim Drugs email Barcelona netscience Edinburgh
  # Figures 1-4: budget sweeps (feasible transport graphs)
  RUN budget --mode break --datasets Anaheim Barcelona Rome --search-spaces 50 250
  RUN budget --mode make --datasets Anaheim Barcelona Rome --search-spaces 50 250
fi
echo "=== queue done ($(date +%H:%M:%S))"
