#!/usr/bin/env bash
# Golden-result reproduction runner (CPU float64, paper protocol).
# Mirrors the reference's Tests/*.m drivers via the experiments CLI; every
# suite resumes duplicate-free via keyed ResultLog rows, so re-running this
# script only fills gaps. The LARGE half of the unweighted roster runs on
# TPU instead (scripts/run_tpu_suites.sh + run_budget_tpu.sh).
# Usage: scripts/run_golden_suites.sh [weighted|unweighted|parity]
set -u
cd "$(dirname "$0")/.."
RUN() { echo "=== $* ($(date +%H:%M:%S))"; timeout 14400 python -u -m krylov_robustness_tpu.experiments "$@"; }

if [ "${1:-all}" = "parity" ] || [ "${1:-all}" = "all" ]; then
  # BASELINE.md 1e-6 north-star: deterministic expmv-action + tightened
  # trace tables vs dense oracles
  RUN parity --dense-cutoff 3500
  RUN trace
fi

if [ "${1:-all}" != "unweighted" ]; then
  # Tables 5-6: weighted IPM suites (10 power-grid countries x 3 methods)
  RUN weighted --fun exp
  RUN weighted --fun sinh
  RUN weighted --fun cosh
  RUN weighted --fun exp --hessian
  RUN weighted --fun sinh --hessian
  RUN weighted --fun cosh --hessian
fi

if [ "${1:-all}" != "weighted" ]; then
  # Tables 2-3: unweighted break/make, CPU-feasible graphs (paper roster
  # members + the small extras kept for continuity with round-1 goldens)
  RUN unweighted --mode break --datasets Journals jazz london USAir97 Anaheim Drugs email Barcelona netscience Edinburgh CollegeMsg yeast Cardiff Rome
  RUN unweighted --mode make --datasets Journals jazz london USAir97 Anaheim Drugs email Barcelona netscience Edinburgh CollegeMsg yeast Cardiff
  # Figures 1-4: budget sweeps, CPU-feasible members of the reference's
  # 6-transport roster (Anaheim, Rome; the rest on TPU)
  bash scripts/run_budget_cpu.sh
fi
python scripts/summarize_results.py
echo "=== queue done ($(date +%H:%M:%S))"
