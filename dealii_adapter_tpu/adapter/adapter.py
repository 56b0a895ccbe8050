"""The coupling Adapter: interface registration, data gather/scatter, and
implicit-coupling checkpointing around a host-side participant.

TPU-native re-design of `Adapter::Adapter<dim, VectorType, ParameterClass>`
(`include/adapter/adapter.h:26-209`):

* Interface discovery (`initialize`, `adapter.h:229-342`): the reference
  walks three per-component boundary IndexSets and maps DoFs to support
  points via `DoFTools::map_boundary_dofs_to_support_points`. Here the
  DofSpace already knows the interface node set and coordinates
  (fem/dofspace.py), so registration is one array lookup.
* Gather/scatter (`format_deal_to_precice`/`format_precice_to_deal`,
  `adapter.h:389-443`): the IndexSet walk collapses to `field[iface_nodes]`
  / zero-scatter at `iface_nodes`. Fields are node-major `(n_nodes, dim)`,
  so the interleaved layout preCICE wants is exactly the gathered array.
* Checkpointing (`save_current_state_if_required` /
  `reload_old_state_if_required`, `adapter.h:447-489`): jax state pytrees
  are immutable, so a checkpoint is a reference + the absolute time; reload
  rewinds the `Time` handler via `set_absolute_time` (`time_handler.h:63-70`).

The participant (libprecice or the in-process fake) lives on host; device
arrays cross the boundary only in `read_data`/`advance` — once per coupling
window, never inside CG/Newton.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np

from ..config import AllParameters
from ..fem.dofspace import DofSpace
from ..time_handler import Time
from .participant import FakeParticipant, Participant, make_participant


class Adapter:
    def __init__(
        self,
        params: AllParameters,
        interface_id: int,
        space: DofSpace,
        participant: Optional[Participant] = None,
        dtype=None,
    ):
        self.params = params
        self.space = space
        self.interface_id = interface_id
        self.mesh_name = params.mesh_name
        self.read_data_name = params.read_data_name
        self.write_data_name = params.write_data_name
        self.precice = make_participant(params, fake=participant)
        self.dtype = dtype

        self.iface_nodes = space.boundary_nodes[interface_id]
        self.n_interface_nodes = len(self.iface_nodes)
        self.vertex_ids: Optional[np.ndarray] = None

        # implicit-coupling checkpoint (state pytree reference + time)
        self._saved: Optional[Tuple[Any, float]] = None

    # ------------------------------------------------------------------

    def initialize(self, write_field) -> None:
        """Register interface vertices and run the participant handshake
        (`adapter.h:229-342`). `write_field` is the (n_nodes, dim) field to
        publish if the partner requires initial data."""
        pdim = self.precice.getMeshDimensions(self.mesh_name)
        if pdim != self.space.dim:
            raise ValueError(
                f"The dimension of the solver ({self.space.dim}) and the "
                f"configured coupling mesh ({pdim}) do not match "
                "(adapter.h:235-240)"
            )
        coords = self.space.boundary_node_coords(self.interface_id)
        self.vertex_ids = self.precice.setMeshVertices(self.mesh_name, coords)
        if self.precice.requiresInitialData():
            self.precice.writeData(
                self.mesh_name,
                self.write_data_name,
                self.vertex_ids,
                self._gather(write_field),
            )
        self.precice.initialize()

    # -- data movement ---------------------------------------------------

    def _gather(self, field) -> np.ndarray:
        """(n_nodes, dim) device field -> (n_iface, dim) host buffer, in
        vertex registration order (`format_deal_to_precice`,
        `adapter.h:389-417`)."""
        return np.asarray(field)[self.iface_nodes]

    def _scatter(self, values: np.ndarray):
        """(n_iface, dim) host buffer -> (n_nodes, dim) device field, zero
        off the interface (`format_precice_to_deal`, `adapter.h:421-443`)."""
        import jax.numpy as jnp

        out = np.zeros((self.space.n_nodes, self.space.dim))
        out[self.iface_nodes] = np.asarray(values).reshape(-1, self.space.dim)
        return jnp.asarray(out, dtype=self.dtype)

    def read_data(self, relative_dt: float):
        """Sample the partner's field `relative_dt` into the current window
        and return it as a device-resident nodal field (`adapter.h:346-361`)."""
        vals = self.precice.readData(
            self.mesh_name, self.read_data_name, self.vertex_ids, relative_dt
        )
        return self._scatter(vals)

    def advance(self, write_field, dt: float) -> None:
        """Publish `write_field` on the interface and advance the coupling
        window (`adapter.h:365-385`) — the inter-solver synchronization
        point."""
        self.precice.writeData(
            self.mesh_name,
            self.write_data_name,
            self.vertex_ids,
            self._gather(write_field),
        )
        self.precice.advance(dt)

    # -- implicit-coupling checkpointing ---------------------------------

    def save_current_state_if_required(self, state, time: Time) -> bool:
        """Deep-copy semantics for free: jax pytrees are immutable, so
        holding the reference IS the checkpoint (`adapter.h:447-464`)."""
        if self.precice.requiresWritingCheckpoint():
            self._saved = (state, time.current())
            return True
        return False

    def reload_old_state_if_required(self, state, time: Time):
        """Returns the state to continue from; rewinds `time` on rollback
        (`adapter.h:468-489`, `time_handler.h:63-70`)."""
        if self.precice.requiresReadingCheckpoint():
            assert self._saved is not None, "rollback without checkpoint"
            saved_state, saved_time = self._saved
            time.set_absolute_time(saved_time)
            return saved_state
        return state

    # -- passthrough steering -------------------------------------------

    def is_coupling_ongoing(self) -> bool:
        return self.precice.isCouplingOngoing()

    def is_time_window_complete(self) -> bool:
        return self.precice.isTimeWindowComplete()

    def get_max_time_step_size(self) -> float:
        return self.precice.getMaxTimeStepSize()

    def finalize(self) -> None:
        self.precice.finalize()
