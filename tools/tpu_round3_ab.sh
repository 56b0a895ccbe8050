#!/usr/bin/env bash
# One-shot round-3 hardware session: run the staged production A/Bs and
# the benchmark the moment the axon TPU tunnel is reachable.
#
# Usage:  bash tools/tpu_round3_ab.sh [logfile]
#
# Stages (each appends to the log; safe to re-run, compiles are cached):
#   1. device probe (fails fast if the tunnel is down)
#   2. mg_sweep production A/Bs at bench scale 9: fine-smoothing degree
#      (prodmix vs prodmixf1), fine-level assembled-tangent smoothing
#      (prodnoft vs prodft) — the two open hardware questions; the Q1
#      level-operator backend is autotuned per level at setup, so its
#      candidates need no separate sweep
#   3. bench.py nonlinear (scale 9, ~1.02M DoF) and linear (scale 4)
#
# After it finishes: read the log, set the winning knobs as bench.py
# defaults if they differ, update PERFORMANCE.md's ledger, and re-run
# bench.py once more to confirm the production line.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_round3_ab.log}"
say() { echo "=== $* ===" | tee -a "$LOG"; }

say "probe $(date -u +%FT%TZ)"
if ! timeout 600 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1; then
  say "TPU unreachable; aborting"
  exit 1
fi

say "mg_sweep scale 9: fine-degree and fine-tangent A/Bs"
timeout 5400 python tools/mg_sweep.py 9 prodmix prodmixf1 prodnoft prodft >> "$LOG" 2>&1

say "bench nonlinear scale 9"
timeout 5400 python bench.py >> "$LOG" 2>&1

say "bench linear scale 4"
BENCH_MODEL=linear timeout 3600 python bench.py >> "$LOG" 2>&1

say "done $(date -u +%FT%TZ)"
tail -40 "$LOG"
