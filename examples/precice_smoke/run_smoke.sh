#!/usr/bin/env bash
# Two-participant localhost coupling smoke against REAL libprecice +
# pyprecice (VERDICT r3 ask #7). Run from a machine with pyprecice
# installed; CI job `precice-smoke` in .github/workflows/test.yml.
#
# Usage: bash examples/precice_smoke/run_smoke.sh
set -euo pipefail

here="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
repo="$(cd "$here/../.." && pwd)"
work="$(mktemp -d)"
trap 'rm -rf "$work"' EXIT
cp "$here/precice-config.xml" "$here/solid.prm" "$here/fluid.py" "$work/"
cd "$work"

python -c "import precice" || {
  echo "pyprecice not installed; smoke requires real libprecice" >&2
  exit 2
}

# fluid first (it is the m2n acceptor)
python fluid.py > fluid.log 2>&1 &
fluid_pid=$!

solid_rc=0
JAX_PLATFORMS=cpu PYTHONPATH="$repo" \
  timeout 600 python -m dealii_adapter_tpu solid.prm --coupled --no-output \
  > solid.log 2>&1 || solid_rc=$?

fluid_rc=0
wait "$fluid_pid" || fluid_rc=$?

echo "--- solid.log ---"; cat solid.log
echo "--- fluid.log ---"; cat fluid.log

if [ "$solid_rc" -ne 0 ] || [ "$fluid_rc" -ne 0 ]; then
  echo "precice smoke FAILED (solid=$solid_rc fluid=$fluid_rc)" >&2
  exit 1
fi
grep -q "fluid: done" fluid.log
echo "precice smoke OK"
