"""Host-side simulation driver: the run_pic() equivalent of the reference's
runPIC (src/pic.cu:359-599).

The host owns only the outer Poisson loop (as in the reference,
src/pic.cu:487): per iteration it launches one jitted device program
(grid phase + whole mobility phase + compaction) and copies back a handful of
scalars for metrics / early exit — the same two-4-byte-copies-per-step
boundary profile as the reference (SURVEY.md §3.1).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import cross_section
from .config import SimConfig
from .state import SimState, setup_particles
from .ops.step import poisson_step


@dataclasses.dataclass
class StepMetrics:
    step: int
    n: int
    added: int
    removed: int
    wall_s: float
    overflow: bool
    pushes: float = 0.0


@dataclasses.dataclass
class RunData:
    """Mirror of the reference's RunData/TimingData (src/utility.h:16-31)."""

    config: SimConfig
    final_n: int
    total_added: int
    total_removed: int
    device_time_ms: float      # jitted-step wall time (block_until_ready)
    state: SimState            # final (compacted) state
    steps: List[StepMetrics]

    @property
    def function(self) -> str:
        return {
            "dynamic": "Dynamic", "sync": "CPU Sync",
            "naive": "Naive", "dynamic_old": "Dynamic Old",
        }[self.config.scheduler]


def run_pic(
    config: SimConfig,
    table: Optional[jnp.ndarray] = None,
    on_step: Optional[Callable[[int, SimState], None]] = None,
    print_header: bool = True,
    initial_state: Optional[SimState] = None,
    first_poisson_index: int = 0,
) -> RunData:
    """Run the full simulation per ``config``; the reference's runPIC.

    ``on_step(t, state)`` is the observability hook (verbose logging /
    PNG snapshots / checkpointing), called every ``config.verbose`` steps
    like the reference's log() (src/utility.cu:124-137).
    """
    if print_header:
        print(
            f"PIC with\ninit n: {config.init_n}\ncapacity: {config.capacity}\n"
            f"poisson steps: {config.poisson_steps}\n"
            f"poisson_timestep: {config.poisson_timestep}\n"
            f"scheduler: {config.scheduler}"
        )
    if table is None:
        table = cross_section.load_table(config.cross_section_path)

    state = setup_particles(config) if initial_state is None else initial_state
    steps: List[StepMetrics] = []
    total_added = 0
    total_removed = 0
    device_s = 0.0

    for t in range(config.poisson_steps):
        if on_step is not None and config.verbose and t % config.verbose == 0:
            on_step(t, state)
        t0 = time.perf_counter()
        state, metrics = poisson_step(
            state, jnp.uint32(t + first_poisson_index), table, config
        )
        n = int(metrics["n"])  # blocks
        dt_wall = time.perf_counter() - t0
        device_s += dt_wall
        m = StepMetrics(
            step=t,
            n=n,
            added=int(metrics["added"]),
            removed=int(metrics["removed"]),
            wall_s=dt_wall,
            overflow=bool(metrics["overflow"]),
            pushes=float(metrics["pushes"]),
        )
        steps.append(m)
        total_added += m.added
        total_removed += m.removed
        if m.overflow:
            print("\n\nOVERFLOW FROM ADDING PARTICLES\n\n")
        if n == 0:
            print("Hit 0")
            break

    if on_step is not None and config.verbose:
        on_step(config.poisson_steps, state)

    final_n = int(state.n)
    if print_header:
        print(f"Final amount of particles: {final_n}")
        print(f"Particles added: {total_added}")
        print(f"Particles removed: {total_removed}")
        print(f"Device time of program: {device_s * 1e3:.3f} ms")
    return RunData(
        config=config,
        final_n=final_n,
        total_added=total_added,
        total_removed=total_removed,
        device_time_ms=device_s * 1e3,
        state=state,
        steps=steps,
    )


def sorted_particle_array(state: SimState) -> np.ndarray:
    """Final particles sorted by the reference's comparison key
    (timestamp, y, x, z, vy, vx, vz — src/electron.h:28-34) for
    scheduler-equivalence comparisons."""
    n = int(state.n)
    pos = np.asarray(state.pos)[:n]
    vel = np.asarray(state.vel)[:n]
    status = np.asarray(state.status)[:n]
    order = np.lexsort(
        (vel[:, 2], vel[:, 0], vel[:, 1], pos[:, 2], pos[:, 0], pos[:, 1], status)
    )
    return np.concatenate(
        [status[order, None].astype(pos.dtype), pos[order], vel[order]], axis=1
    )
