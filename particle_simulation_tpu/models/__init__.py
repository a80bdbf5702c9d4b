"""Physics models of the PIC-MCC simulation.

The reference hardcodes one model of each kind; here they are explicit,
swappable components:

  * integrator  — how particles move under the frozen per-step field
                  (models/integrator.py; reference leapfrog,
                  src/particle_move.cu:22-39)
  * collisions  — the Monte-Carlo collision model: energy-bucketed
                  split/absorb table (models/collisions.py; reference
                  collider + cross_section, src/particle_move.cu:55-80)
  * field       — charge deposition + electric field approximation
                  (models/field.py; reference grid_operations.cu)
"""

from . import collisions, field, integrator  # noqa: F401
