"""Host-chunked staged engine (poisson_step_staged_host).

The dynamic_old work-list fixed point driven as a host loop of bounded
pass dispatches must be BIT-EXACT vs the in-jit phase — the dispatches
partition the identical pass sequence over a device-resident carry
(ops/pallas/push_mcc.mobility_phase_dynamic_host).  It exists to bound
single-dispatch runtime for the crash-prone canonical tails (STATUS.md);
these tests pin the exactness contract the workaround rides on.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from particle_simulation_tpu import SimConfig, setup_particles
from particle_simulation_tpu.ops.step import (
    poisson_step,
    poisson_step_staged_host,
)
from particle_simulation_tpu.runtime import (
    run_pic_device,
    sorted_particle_array,
)

from test_worklog import BASE

CFG = BASE.replace(
    scheduler="dynamic_old",
    poisson_steps=2,
    poisson_timestep=6,
    # shallow staging forces suspend/resume cycling -> several sweep
    # passes per step, so pass_chunk boundaries actually cut the loop
    spawn_depth=1,
)


def _run(cfg, table, step_fn):
    state = setup_particles(cfg)
    metrics = []
    for t in range(cfg.poisson_steps):
        state, m = step_fn(state, jnp.uint32(t), table, cfg)
        metrics.append(
            {k: np.asarray(m[k]).item() for k in
             ("n", "added", "removed", "overflow", "pushes_lo", "pushes_hi")}
        )
    return sorted_particle_array(state), metrics


@pytest.mark.parametrize(
    "pass_chunk", [pytest.param(1, marks=pytest.mark.slow), 3]
)
def test_staged_host_bit_exact(const_table, pass_chunk):
    ref, ref_m = _run(CFG, const_table, poisson_step)

    def host_step(state, t, table, cfg):
        return poisson_step_staged_host(
            state, t, table, cfg, pass_chunk=pass_chunk,
            stop_on_overflow=False,
        )

    got, got_m = _run(CFG, const_table, host_step)
    np.testing.assert_array_equal(ref, got)
    assert ref_m == got_m


def test_staged_host_via_run_pic_device(const_table):
    ref = run_pic_device(CFG, table=const_table)
    got = run_pic_device(CFG, table=const_table, staged_chunk=1)
    np.testing.assert_array_equal(
        sorted_particle_array(ref.state), sorted_particle_array(got.state)
    )
    assert ref.final_n == got.final_n
    assert [ (s.n, s.added, s.removed, s.overflow) for s in ref.steps ] == \
           [ (s.n, s.added, s.removed, s.overflow) for s in got.steps ]
