"""Coupling adapter layer — the preCICE seam of the framework.

Mirrors the capability of the reference's header-only adapter
(`include/adapter/adapter.h:26-209`): interface-DoF discovery, vertex
registration, gather/scatter between global FEM fields and the coupling
library's interleaved flat buffers, read/write/advance, and
implicit-coupling checkpoint save/reload. libprecice stays host-side; the
device-resident state pytree crosses the host boundary once per coupling
window, never per solver iteration.

`participant.py` defines the 14-method participant API surface actually
used by the reference (SURVEY.md §2 item 7) as a Protocol, a scriptable
in-process `FakeParticipant` (the test double the reference never had), and
a `PreciceParticipant` binding to real pyprecice when installed.
"""

from .adapter import Adapter
from .participant import FakeParticipant, PreciceParticipant, make_participant

__all__ = ["Adapter", "FakeParticipant", "PreciceParticipant", "make_participant"]
