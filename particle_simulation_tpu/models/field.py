"""Field model: charge deposition and the local electric-field
approximation.

Default: the reference's nearest-cell count deposition + (charge[+1] -
charge[-1]) * E_const neighbour difference (src/grid_operations.cu) — not a
true Poisson solve; kept for parity.  The fused deposit/stencil/gather
implementation lives in ops/grid.py; a spectral (FFT) Poisson solver is the
flagged upgrade path (models/poisson_fft.py when it lands).
"""

from ..constants import electric_force_constant  # noqa: F401
from ..ops.grid import (  # noqa: F401
    cell_indices,
    deposit,
    field_grid,
    gather_acceleration,
)
