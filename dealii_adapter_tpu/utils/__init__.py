"""Output and observability: VTK Lagrange-cell writer, strain
postprocessor, and section wall timers."""

from .postprocessor import compute_nodal_strain
from .timer import TimerOutput
from .vtk import write_vtu

__all__ = ["compute_nodal_strain", "TimerOutput", "write_vtu"]
