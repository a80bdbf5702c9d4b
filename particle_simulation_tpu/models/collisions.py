"""Monte-Carlo collision models, selectable via ``SimConfig.collision_model``.

One uniform draw per particle-step is tested against energy-bucketed
(split, absorb) chances; energy = |v|^2, log10 bucketing over [1e-6, 1e16)
into 10000 buckets (reference src/particle_move.cu:55-80,
src/cross_section.cu).  Tables are data (cross_section.py); the TPU engines
keep them VMEM-resident.

On ionization the models differ in how momentum is distributed:

* ``reverse`` (default) — the reference's model: the child is a copy of the
  post-push parent and the parent's velocity reverses
  (src/particle_move.cu:62-74).
* ``isotropic`` — the child is emitted isotropically at the parent's speed
  (direction drawn deterministically from the child's own genealogy id
  bits), the parent keeps its velocity — the common textbook MCC secondary
  model.  All DECISIONS (splits, deaths, genealogy, counts) stay exact and
  cadence-independent; the child-velocity floats involve sin/cos whose FMA
  fusion may differ by ~1 ulp between compiled programs, so cross-engine
  comparisons of velocity payloads use a tight tolerance rather than bit
  equality (tests/test_models.py).

The dispatch lives in ops/physics.update_particles so the XLA and Pallas
engines share it verbatim.
"""

from ..cross_section import (  # noqa: F401
    N_STEPS,
    energy_to_index,
    generate_table,
    load_table,
)
from ..ops.physics import collision_energy, update_particles  # noqa: F401

AVAILABLE = ("reverse", "isotropic")
