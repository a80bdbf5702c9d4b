"""Spectral Poisson solver (models/poisson_fft.py)."""

import jax.numpy as jnp
import numpy as np

from particle_simulation_tpu import SimConfig
from particle_simulation_tpu.constants import ELECTRON_CHARGE, EPSILON0
from particle_simulation_tpu.models import poisson_fft
from particle_simulation_tpu.runtime import run_pic

G = (16, 16, 16)
H = 0.5


def discrete_laplacian(phi, h):
    lap = -6.0 * phi
    for ax in range(3):
        lap = lap + np.roll(phi, 1, ax) + np.roll(phi, -1, ax)
    return lap / (h * h)


def test_solver_satisfies_discrete_poisson():
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 5, G).astype(np.int32)
    phi = np.asarray(poisson_fft.solve_potential(jnp.asarray(counts), H))
    rho = counts.astype(np.float64) * ELECTRON_CHARGE / H**3
    rhs = -(rho - rho.mean()) / EPSILON0  # mean mode removed by convention
    lap = discrete_laplacian(phi.astype(np.float64), H)
    np.testing.assert_allclose(lap, rhs, rtol=2e-4, atol=abs(rhs).max() * 2e-4)


def test_point_charge_field_is_repulsive_for_electrons():
    counts = jnp.zeros(G, jnp.int32).at[8, 8, 8].set(100)
    acc = np.asarray(poisson_fft.acceleration_grid(counts, H))
    # electron just +x of the charge is pushed further +x (like charges repel)
    assert acc[9, 8, 8, 0] > 0
    assert acc[7, 8, 8, 0] < 0
    assert acc[8, 9, 8, 1] > 0
    # symmetry
    np.testing.assert_allclose(acc[9, 8, 8, 0], -acc[7, 8, 8, 0], rtol=1e-4)


def test_fft_field_model_end_to_end():
    cfg = SimConfig(
        init_n=200, capacity=2000, poisson_steps=2, poisson_timestep=4,
        grid_size=(16, 16, 16), field_model="fft",
    )
    run = run_pic(cfg, print_header=False)
    assert run.final_n > 0
    acc = np.asarray(run.state.acc)[: run.final_n]
    assert np.isfinite(acc).all()
    assert (acc != 0).any()
