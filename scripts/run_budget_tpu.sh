#!/usr/bin/env bash
# Budget sweeps for the large transport graphs (Figures 1-4 roster), on the
# TPU f32 path. Ascending cost; Q sweeps {50,250,1000} inside the driver.
# Resumable via keyed ResultLog rows.
set -u
cd "$(dirname "$0")/.."
RUN() { echo "=== budget $* ($(date +%H:%M:%S))"; timeout 21600 python -u -m krylov_robustness_tpu.experiments --tpu --out-dir results_tpu budget "$@"; }

RUN --mode break --datasets Rome
RUN --mode make  --datasets Rome
RUN --mode break --datasets ChicagoRegional
RUN --mode make  --datasets ChicagoRegional
RUN --mode break --datasets Birmingham
RUN --mode make  --datasets Birmingham
RUN --mode break --datasets RhodeIsland
RUN --mode make  --datasets RhodeIsland
RUN --mode break --datasets Hawaii
RUN --mode make  --datasets Hawaii
python scripts/summarize_results.py
echo "=== tpu budget queue done ($(date +%H:%M:%S))"
