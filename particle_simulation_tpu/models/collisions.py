"""Monte-Carlo collision model: one uniform draw per particle-step tested
against energy-bucketed (split, absorb) chances.

Reference semantics (src/particle_move.cu:55-80, src/cross_section.cu):
energy = |v|^2, log10 bucketing over [1e-6, 1e16) into 10000 buckets;
rand < split -> ionize (child copy, parent velocity reversal);
rand < split+remove -> absorb.  Tables are data (cross_section.py); the
TPU engine keeps them VMEM-resident.
"""

from ..cross_section import (  # noqa: F401
    N_STEPS,
    energy_to_index,
    generate_table,
    load_table,
)
from ..ops.physics import collision_energy, update_particles  # noqa: F401
