"""Minimal pyprecice fluid stub for the CI coupling smoke.

Plays the fluid side of examples/precice_smoke/precice-config.xml: writes a
constant traction onto the flap interface and reads the solid's
displacement back, through the real libprecice (v3) — validating the
snake_case binding surface our PreciceParticipant wraps
(dealii_adapter_tpu/adapter/participant.py) against the actual library,
including the implicit-coupling checkpoint verbs. Reference surface:
/root/reference/include/adapter/adapter.h:217-225,324-384,447-489.
"""

import sys

import numpy as np
import precice

STRESS = np.array([0.0, 1000.0])  # constant upward traction (Pa)


def main() -> int:
    p = precice.Participant("Fluid", "precice-config.xml", 0, 1)

    # a coarse sampling of the FSI3 flap boundary (box (0.24899, 0.19) ..
    # (0.6, 0.21)); nearest-neighbor mapping carries it to the solid mesh
    xs = np.linspace(0.25, 0.6, 8)
    coords = np.concatenate(
        [
            np.stack([xs, np.full_like(xs, 0.21)], 1),  # top
            np.stack([xs, np.full_like(xs, 0.19)], 1),  # bottom
            np.array([[0.6, 0.20]]),  # tip
        ]
    )
    ids = p.set_mesh_vertices("Fluid-Mesh", coords)
    stress = np.tile(STRESS, (len(ids), 1))

    if p.requires_initial_data():
        p.write_data("Fluid-Mesh", "Stress", ids, stress)
    p.initialize()

    n_windows = 0
    max_tip = 0.0
    while p.is_coupling_ongoing():
        if p.requires_writing_checkpoint():
            pass  # stateless fluid: nothing to save
        dt = p.get_max_time_step_size()
        disp = p.read_data("Fluid-Mesh", "Displacement", ids, dt)
        max_tip = max(max_tip, float(np.abs(disp).max()))
        p.write_data("Fluid-Mesh", "Stress", ids, stress)
        p.advance(dt)
        if p.requires_reading_checkpoint():
            pass  # stateless fluid: nothing to restore
        if p.is_time_window_complete():
            n_windows += 1
            print(f"fluid: window {n_windows} complete, "
                  f"max|u| so far = {max_tip:.3e}")
    p.finalize()

    if n_windows < 1:
        print("fluid: no coupling window completed", file=sys.stderr)
        return 1
    if not np.isfinite(max_tip):
        print("fluid: non-finite displacement received", file=sys.stderr)
        return 1
    print(f"fluid: done ({n_windows} windows, max|u| = {max_tip:.3e})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
