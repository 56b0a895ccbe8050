#!/usr/bin/env bash
# One-shot round-4 hardware session (run stages individually if preferred;
# compiles are cached in .jax_cache, measurements in .bench_autotune.json).
#
# Usage:  bash tools/tpu_round4_ab.sh [logfile]
#
# Stages:
#   1. device probe (fails fast if the axon tunnel is down)
#   2. compiled-kernel parity: every Pallas kernel vs XLA on the real chip
#      (round-3 lesson: the Q2 phase kernel shipped without ever compiling
#      on hardware; the vmem stencil kernel failed Mosaic there)
#   3. bench.py nonlinear (scale 9, ~1.02M DoF) — Q2 phase kernel ON
#      (default); wall-clock the WHOLE run against the driver's ~30-min
#      window
#   4. A/B: same bench with BENCH_USE_PALLAS=0 (Q2 phase kernel off)
#   5. bench.py linear (scale 4, ~100k DoF) — first-class ledger row
#   6. production-degree data points: nonlinear Q4 and linear Q3 at
#      >=100k DoF (the reference's shipping degrees)
#
# After: update PERFORMANCE.md ledger + README headline (test
# tests/test_docs_consistency.py pins them together), commit
# .bench_autotune.json so driver-spawned fresh processes skip setup
# re-measurement.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_round4_ab.log}"
say() { echo "=== $* ===" | tee -a "$LOG"; }

say "probe $(date -u +%FT%TZ)"
if ! timeout 600 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1; then
  say "TPU unreachable; aborting"
  exit 1
fi

say "compiled-kernel parity"
timeout 1200 python tools/tpu_parity_check.py >> "$LOG" 2>&1 || say "PARITY FAILED"

say "bench nonlinear scale 9 (Q2 phase kernel on)"
(time timeout 2100 python bench.py) >> "$LOG" 2>&1

say "bench nonlinear scale 9 (Q2 phase kernel OFF)"
BENCH_USE_PALLAS=0 timeout 2100 python bench.py >> "$LOG" 2>&1

say "bench linear scale 4"
BENCH_MODEL=linear timeout 2100 python bench.py >> "$LOG" 2>&1

say "production degrees: nonlinear Q4 scale 3 (313k DoF), linear Q3 scale 3 (137k DoF)"
BENCH_DEGREE=4 BENCH_SCALE=3 timeout 2100 python bench.py >> "$LOG" 2>&1
BENCH_MODEL=linear BENCH_DEGREE=3 BENCH_SCALE=3 timeout 2100 python bench.py >> "$LOG" 2>&1

say "done $(date -u +%FT%TZ)"
tail -60 "$LOG"
