"""Particle integrator models, selectable via ``SimConfig.integrator``.

* ``leapfrog`` (default) — the reference's kick-drift-kick with its
  v-minus-a sign convention and frozen per-Poisson-step acceleration
  (src/particle_move.cu:22-39): drift uses the mid-step velocity.
* ``boris`` — zero-magnetic-field Boris push: the full velocity kick is
  applied first (two symmetric half-kicks, no rotation at B=0), then the
  drift uses the fully-updated velocity.  The standard PIC integrator for
  magnetized plasmas; with B=0 it differs from leapfrog only in drift
  phase, making it a genuinely distinct, testable model
  (tests/test_models.py).

Both implementations live in ops/physics.py so the XLA and Pallas engines
share them verbatim; every scheduler cadence is bit-equal under either
selection (genealogy-keyed RNG is integrator-agnostic).
"""

from ..ops.physics import INTEGRATORS, boris, leapfrog, out_of_bounds  # noqa: F401

AVAILABLE = dict(INTEGRATORS)
