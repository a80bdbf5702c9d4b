"""Spawn-append and compaction invariants (ops/population.py) — the
functional equivalents of the reference's atomic append protocols and
remove_dead_particles (src/pic.cu:44-67, 320-357)."""

import jax.numpy as jnp
import numpy as np
import pytest

from particle_simulation_tpu import SimConfig
from particle_simulation_tpu.constants import (
    STATUS_ALIVE,
    STATUS_DEAD,
    STATUS_EMPTY,
)
from particle_simulation_tpu.ops.physics import Particles
from particle_simulation_tpu.ops.population import append_children, compact
from particle_simulation_tpu.state import setup_particles, zero_state


def mk_state(capacity=16, n=8):
    cfg = SimConfig(init_n=n, capacity=capacity, grid_size=(8, 8, 8))
    return setup_particles(cfg)


def mk_children(capacity, spawn_slots, mark=7.0):
    spawn = np.zeros(capacity, bool)
    spawn[spawn_slots] = True
    f = lambda v: jnp.full((capacity,), v, jnp.float32)
    child = Particles(
        px=jnp.arange(capacity, dtype=jnp.float32),  # parent slot as marker
        py=f(mark), pz=f(0.0), vx=f(0.0), vy=f(0.0), vz=f(0.0),
        ax=f(0.0), ay=f(0.0), az=f(0.0),
        status=jnp.full((capacity,), 3, jnp.int32),
        id_hi=jnp.arange(capacity, dtype=jnp.uint32),
        id_lo=jnp.arange(capacity, dtype=jnp.uint32),
    )
    return jnp.asarray(spawn), child


def test_append_in_parent_order():
    st = mk_state(capacity=16, n=8)
    spawn, child = mk_children(16, [2, 5, 7])
    out = append_children(st, spawn, child)
    assert int(out.n) == 11
    # children land at slots 8,9,10 in parent-slot order (markers 2,5,7)
    np.testing.assert_array_equal(np.asarray(out.pos[8:11, 0]), [2.0, 5.0, 7.0])
    np.testing.assert_array_equal(np.asarray(out.status[8:11]), [3, 3, 3])


def test_append_overflow_drops_but_counts():
    st = mk_state(capacity=10, n=8)
    spawn, child = mk_children(10, [0, 1, 2, 3])
    out = append_children(st, spawn, child)
    # 4 spawned, only 2 fit; n counts all 4 (overflow detectable)
    assert int(out.n) == 12
    assert int(out.n_clamped) == 10
    np.testing.assert_array_equal(np.asarray(out.pos[8:10, 0]), [0.0, 1.0])


def test_compact_preserves_order_and_resets_status():
    st = mk_state(capacity=16, n=8)
    status = np.asarray(st.status).copy()
    status[[1, 4, 6]] = STATUS_DEAD
    status[3] = 5  # spawned-this-step particle survives as ALIVE
    st = st._replace(status=jnp.asarray(status))
    out = compact(st)
    assert int(out.n) == 5
    # survivors keep original relative order: slots 0,2,3,5,7
    np.testing.assert_array_equal(
        np.asarray(out.id_lo[:5]), np.asarray(st.id_lo)[[0, 2, 3, 5, 7]]
    )
    assert (np.asarray(out.status[:5]) == STATUS_ALIVE).all()
    assert (np.asarray(out.status[5:]) == STATUS_EMPTY).all()
    # cleared fields beyond n
    assert float(jnp.abs(out.pos[5:]).sum()) == 0.0


def test_compact_all_dead():
    st = mk_state(capacity=8, n=8)
    st = st._replace(status=jnp.full((8,), STATUS_DEAD, jnp.int32))
    out = compact(st)
    assert int(out.n) == 0
    assert (np.asarray(out.status) == STATUS_EMPTY).all()


def test_compact_ignores_slots_beyond_n():
    st = zero_state(SimConfig(init_n=1, capacity=8, grid_size=(8, 8, 8)))
    status = np.full(8, STATUS_EMPTY, np.int32)
    status[:3] = STATUS_ALIVE
    status[5] = STATUS_ALIVE  # garbage beyond n — must be ignored
    st = st._replace(status=jnp.asarray(status), n=jnp.int32(3))
    out = compact(st)
    assert int(out.n) == 3


@pytest.mark.slow
def test_append_children_fast_path_matches_slow():
    """Capacity above the fast-path window exercises the windowed
    dynamic_update_slice append; physics must match the generic path."""
    import jax.numpy as jnp
    import numpy as np

    from particle_simulation_tpu.cross_section import bundled_paths
    from particle_simulation_tpu.ops.step import poisson_step
    from particle_simulation_tpu.runtime import sorted_particle_array
    from particle_simulation_tpu import SimConfig
    from particle_simulation_tpu.state import setup_particles as setup

    big = SimConfig(init_n=500, capacity=(1 << 17) + 4096, poisson_steps=2,
                    poisson_timestep=5, grid_size=(32, 32, 32),
                    cross_section_path=bundled_paths()[1], scheduler="naive")
    small = big.replace(capacity=60_000)  # below window -> generic path
    sb = setup(big)
    ss = setup(small)
    table = None
    from particle_simulation_tpu.cross_section import load_table
    table = load_table(big.cross_section_path)
    for t in range(2):
        sb, mb = poisson_step(sb, jnp.uint32(t), table, big)
        ss, ms = poisson_step(ss, jnp.uint32(t), table, small)
        assert int(mb["n"]) == int(ms["n"])
    np.testing.assert_array_equal(
        sorted_particle_array(sb), sorted_particle_array(ss)
    )
