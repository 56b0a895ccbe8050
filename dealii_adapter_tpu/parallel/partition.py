"""Host-side cell partitioning for SPMD element kernels.

Cells are split into contiguous lexicographic blocks, one per device. Because
the mesh numbering is lexicographic (mesh/generator.py), a contiguous cell
block touches a *contiguous window* of global node ids, so each shard's
transpose-gather plan only needs rows for its node window. The device-local
reduction produces a `(window, dim)` block that is placed at the window
offset in a zero buffer and `psum`-reduced across the mesh axis — the only
collective in the hot path.

This replaces the reference's TBB WorkStream scatter
(`nonlinear_elasticity.cc:1078-1084`, serialized copy_local_to_global) with
a deterministic, scatter-free SPMD reduction.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import numpy as np

from ..fem.dofspace import build_transpose_gather_plan


def make_device_mesh(n_devices: int | None = None, axis: str = "shards"):
    """A 1D device mesh over the first `n_devices` jax devices."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, only {len(devs)} available")
    return Mesh(np.asarray(devs[:n]), (axis,))


@dataclasses.dataclass(frozen=True)
class CellPartition:
    """Per-device padded cell blocks + windowed transpose-gather plans.

    Attributes (all host numpy; leading axis = shard):
      cells:    (n_shards, cpd, npc) int32 — padded with node 0 rows; padded
                rows are never referenced by any plan so they contribute 0.
      plans:    (n_shards, wlen, maxval) int32 — indices into the flattened
                local (cpd*npc + 1) cell-value array; cpd*npc is the zero
                sentinel row.
      offsets:  (n_shards,) int32 — global node id of each shard's window row 0.
      n_valid:  (n_shards,) int32 — real (unpadded) cell count per shard.
      n_nodes:  global node count; n_nodes_pad >= n_nodes is the psum buffer
                length (window placement never clamps).
    """

    n_shards: int
    cpd: int
    cells: np.ndarray
    plans: np.ndarray
    offsets: np.ndarray
    n_valid: np.ndarray
    n_nodes: int
    n_nodes_pad: int

    @classmethod
    def create(cls, cells: np.ndarray, n_nodes: int, n_shards: int) -> "CellPartition":
        n_cells, npc = cells.shape
        cpd = math.ceil(n_cells / n_shards)
        sentinel = cpd * npc

        cells_sh = np.zeros((n_shards, cpd, npc), dtype=np.int32)
        plan_list = []
        offsets = np.zeros(n_shards, dtype=np.int32)
        n_valid = np.zeros(n_shards, dtype=np.int32)
        wlens, maxvals = [], []
        for d in range(n_shards):
            block = cells[d * cpd : min((d + 1) * cpd, n_cells)]
            m = block.shape[0]
            n_valid[d] = m
            cells_sh[d, :m] = block
            if m == 0:
                # empty shard (more devices than cells): all-sentinel plan
                offsets[d] = 0
                plan_list.append(np.full((1, 1), sentinel, dtype=np.int64))
                wlens.append(1)
                maxvals.append(1)
                continue
            lo = int(block.min())
            hi = int(block.max()) + 1
            offsets[d] = lo
            local_plan, local_sentinel = build_transpose_gather_plan(
                block - lo, hi - lo
            )
            # re-point the sentinel at the padded flat length
            local_plan = np.where(local_plan == local_sentinel, sentinel, local_plan)
            plan_list.append(local_plan)
            wlens.append(hi - lo)
            maxvals.append(local_plan.shape[1])

        wlen = max(wlens)
        maxval = max(maxvals)
        plans = np.full((n_shards, wlen, maxval), sentinel, dtype=np.int32)
        for d, p in enumerate(plan_list):
            plans[d, : p.shape[0], : p.shape[1]] = p

        n_nodes_pad = max(int(offsets.max()) + wlen, n_nodes)
        return cls(
            n_shards=n_shards,
            cpd=cpd,
            cells=cells_sh,
            plans=plans,
            offsets=offsets,
            n_valid=n_valid,
            n_nodes=n_nodes,
            n_nodes_pad=n_nodes_pad,
        )

    @property
    def npc(self) -> int:
        return self.cells.shape[2]

    @property
    def wlen(self) -> int:
        return self.plans.shape[1]
