"""Field model: charge deposition and the local electric-field
approximation.

Two selectable models (SimConfig.field_model):

* ``neighbour`` (default) — the reference's nearest-cell count deposition +
  (charge[+1] - charge[-1]) * E_const neighbour difference
  (src/grid_operations.cu); not a true Poisson solve, kept for parity.
  f32 production path packs the three integer stencil diffs into one i32
  grid and gathers once per particle
  (ops/grid.gather_acceleration_packdiff, bit-identical and fastest
  measured); gather_acceleration_packed keeps the (cells, 3) row-gather
  variant, and the fused per-particle path (gather_acceleration) serves
  f64 oracle runs.
* ``fft`` — a true spectral Poisson solve (models/poisson_fft.py), the
  flagged fidelity upgrade beyond reference parity.
"""

from ..constants import electric_force_constant  # noqa: F401
from ..ops.grid import (  # noqa: F401
    cell_indices,
    deposit,
    field_grid,
    gather_acceleration,
    gather_acceleration_packed,
    gather_acceleration_packdiff,
)
from .poisson_fft import gather_acceleration_fft  # noqa: F401
