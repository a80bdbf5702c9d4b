"""RNG correctness: Threefry-2x32 vectors, determinism, stream properties.

Covers the property the reference's per-slot cuRAND design exists for
(src/random.cu:3-5, slides "Random Numbers"): streams independent of
execution order, uniform, reproducible.
"""

import jax.numpy as jnp
import numpy as np

from particle_simulation_tpu import rng


def test_threefry_matches_jax_reference():
    """Our jnp implementation must agree with JAX's own Threefry-2x32."""
    from jax._src.prng import threefry_2x32

    key = jnp.array([0xDEADBEEF, 0x12345678], dtype=jnp.uint32)
    count = jnp.arange(64, dtype=jnp.uint32)
    expected = np.asarray(threefry_2x32(key, count))
    # JAX's threefry_2x32 splits `count` into two halves (ctr0, ctr1) and
    # concatenates (out0, out1).
    half = count.shape[0] // 2
    got0, got1 = rng.threefry2x32(key[0], key[1], count[:half], count[half:])
    got = np.concatenate([np.asarray(got0), np.asarray(got1)])
    np.testing.assert_array_equal(got, expected)


def test_threefry_known_vector():
    """Published test vector for Threefry-2x32, 20 rounds (Random123):
    key = ctr = 0 -> 6b200159 99ba4efe."""
    x0, x1 = rng.threefry2x32(0, 0, 0, 0)
    assert int(x0) == 0x6B200159
    assert int(x1) == 0x99BA4EFE


def test_uniform_range_and_determinism():
    ids_hi, ids_lo = rng.initial_ids(39587, np.arange(10_000))
    u = rng.step_uniform(39587, ids_hi, ids_lo, 3, 7, 0.0, 100.0)
    u = np.asarray(u)
    assert u.min() >= 0.0 and u.max() < 100.0
    # reproducible
    u2 = np.asarray(rng.step_uniform(39587, ids_hi, ids_lo, 3, 7, 0.0, 100.0))
    np.testing.assert_array_equal(u, u2)
    # roughly uniform: mean ~50, each decile populated
    assert abs(u.mean() - 50.0) < 1.5
    hist, _ = np.histogram(u, bins=10, range=(0, 100))
    assert hist.min() > 800


def test_streams_differ_across_particles_and_steps():
    ids_hi, ids_lo = rng.initial_ids(39587, np.arange(1000))
    a = np.asarray(rng.step_uniform(1, ids_hi, ids_lo, 0, 1))
    b = np.asarray(rng.step_uniform(1, ids_hi, ids_lo, 0, 2))
    c = np.asarray(rng.step_uniform(1, ids_hi, ids_lo, 1, 1))
    assert (a != b).mean() > 0.99
    assert (a != c).mean() > 0.99
    # negligible correlation between consecutive steps
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.1


def test_child_ids_unique():
    """Genealogy ids must not collide between children and parents."""
    ids_hi, ids_lo = rng.initial_ids(39587, np.arange(5000))
    _, ch, cl = rng.step_draws(39587, ids_hi, ids_lo, 2, 5)
    parents = set(zip(np.asarray(ids_hi).tolist(), np.asarray(ids_lo).tolist()))
    children = set(zip(np.asarray(ch).tolist(), np.asarray(cl).tolist()))
    assert len(parents) == 5000
    assert len(children) == 5000
    assert not (parents & children)


def test_setup_uniform_in_box():
    ids_hi, ids_lo = rng.initial_ids(39587, np.arange(1000))
    x = np.asarray(rng.setup_uniform(ids_hi, ids_lo, 0, 2.26, 2.88))
    assert x.min() >= 2.26 and x.max() < 2.88


def test_setup_gaussian_stats_and_determinism():
    """Thermal-init draws (SimConfig.init_vth) are standard normal per axis,
    deterministic, and disjoint from the position draws' counter stream."""
    n = 16384
    ids_hi, ids_lo = rng.initial_ids(39587, np.arange(n))
    z = np.asarray(rng.setup_gaussian(ids_hi, ids_lo, 0), np.float64)
    assert abs(z.mean()) < 4 / np.sqrt(n)
    assert abs(z.std() - 1.0) < 0.03
    # deterministic
    z2 = np.asarray(rng.setup_gaussian(ids_hi, ids_lo, 0))
    np.testing.assert_array_equal(z.astype(np.float32), z2)
    # axes independent-ish: distinct values, low correlation
    z1 = np.asarray(rng.setup_gaussian(ids_hi, ids_lo, 1), np.float64)
    assert not np.array_equal(z, z1)
    assert abs(np.corrcoef(z, z1)[0, 1]) < 0.03
    # finite even at the u1=0 clamp boundary
    assert np.isfinite(z).all()


def test_setup_particles_thermal_velocities():
    from particle_simulation_tpu import SimConfig, setup_particles

    cfg = SimConfig(init_n=4096, capacity=8192, grid_size=(64, 64, 64),
                    init_vth=250.0)
    st = setup_particles(cfg)
    v = np.asarray(st.vel, np.float64)
    live = v[:4096]
    assert np.all(v[4096:] == 0)          # empty slots stay zero
    assert abs(live.mean()) < 4 * 250 / np.sqrt(3 * 4096)
    assert abs(live.std() - 250.0) < 250 * 0.05
    # default stays the reference's zero-velocity start
    st0 = setup_particles(cfg.replace(init_vth=0.0))
    assert np.all(np.asarray(st0.vel) == 0)
