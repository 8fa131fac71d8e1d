#!/usr/bin/env bash
# Continuation runner: completes the suites interrupted by the host-OOM
# (fixed by per-dataset jax.clear_caches; ResultLog now resumes same-day
# tables). Usage: scripts/run_golden_suites2.sh [weighted|unweighted]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD
RUN() { echo "=== $* ($(date +%H:%M:%S))"; timeout 14400 python -m krylov_robustness_tpu.experiments "$@"; }

if [ "${1:-all}" != "unweighted" ]; then
  RUN weighted --fun sinh --countries Mexico Poland Portugal Sweden
  RUN weighted --fun cosh --countries Mexico Poland Portugal Sweden
  RUN weighted --fun exp --hessian --countries England Germany India Italy Mexico Poland Portugal Sweden
  RUN weighted --fun sinh --hessian
  RUN weighted --fun cosh --hessian
fi

if [ "${1:-all}" != "weighted" ]; then
  RUN budget --mode break --datasets Anaheim Barcelona Rome --search-spaces 50 250
  RUN budget --mode make --datasets Anaheim Barcelona Rome --search-spaces 50 250
fi
echo "=== queue2 done ($(date +%H:%M:%S))"
