"""Particle integrator model.

Default: the reference's kick-drift-kick leapfrog with its v-minus-a sign
convention (src/particle_move.cu:22-39), frozen acceleration per Poisson
step.  The functional core lives in ops/physics.leapfrog; this module is the
model-level façade and the place alternative integrators (Boris push for
magnetized plasmas) slot in.
"""

from ..ops.physics import leapfrog, out_of_bounds  # noqa: F401

AVAILABLE = {"leapfrog": leapfrog}
