"""Fused Pallas engine ('dynamic' scheduler) vs the pure-JAX oracle.

On CPU the kernel runs in interpreter mode; the same test module runs on
real TPU hardware (pytest tests/ on a TPU-visible session) where it
exercises the compiled Mosaic kernel.
"""

import numpy as np
import pytest

from particle_simulation_tpu import SimConfig
from particle_simulation_tpu.cross_section import bundled_paths
from particle_simulation_tpu.runtime import run_pic, sorted_particle_array

CFG = SimConfig(
    init_n=300,
    capacity=8192,
    poisson_steps=2,
    poisson_timestep=6,
    grid_size=(32, 32, 32),
    cross_section_path=bundled_paths()[1],  # constant 50/50: heavy churn
    spawn_depth=6,
)


@pytest.mark.slow
def test_dynamic_matches_oracle():
    base = run_pic(CFG.replace(scheduler="sync"), print_header=False)
    dyn = run_pic(CFG.replace(scheduler="dynamic"), print_header=False)
    assert dyn.final_n == base.final_n
    np.testing.assert_array_equal(
        sorted_particle_array(base.state), sorted_particle_array(dyn.state)
    )


@pytest.mark.slow
def test_dynamic_growth_accounting():
    """Slow lane (r4 split): per-step added/removed/n consistency of the
    dynamic engine is also asserted by every wl_m == oracle_m comparison
    in tests/test_worklog.py, which stays in the default lane."""
    run = run_pic(CFG.replace(scheduler="dynamic"), print_header=False)
    n = CFG.init_n
    for m in run.steps:
        n = n + m.added - m.removed
        assert n == m.n
    assert not any(m.overflow for m in run.steps)


@pytest.mark.slow
def test_dynamic_suspension_exactness():
    """spawn_depth=1 forces constant suspend/resume cycling; physics must
    STILL match the oracle exactly (no child ever dropped)."""
    cfg = CFG.replace(spawn_depth=1, poisson_steps=2)
    base = run_pic(cfg.replace(scheduler="sync"), print_header=False)
    dyn = run_pic(cfg.replace(scheduler="dynamic"), print_header=False)
    assert dyn.final_n == base.final_n
    np.testing.assert_array_equal(
        sorted_particle_array(base.state), sorted_particle_array(dyn.state)
    )


@pytest.mark.slow
def test_dynamic_nonaligned_capacity():
    """Capacity not a multiple of the tile size exercises the padding path."""
    cfg = CFG.replace(capacity=5000, init_n=200, poisson_steps=1)
    base = run_pic(cfg.replace(scheduler="naive"), print_header=False)
    dyn = run_pic(cfg.replace(scheduler="dynamic"), print_header=False)
    assert dyn.final_n == base.final_n
    np.testing.assert_array_equal(
        sorted_particle_array(base.state), sorted_particle_array(dyn.state)
    )


@pytest.mark.slow
def test_dynamic_windowed_append_paths():
    """Small append_window exercises the fast (windowed) path and, with a
    tiny window, the compiled fallback; both must match the oracle."""
    for window in (64, 4096):
        cfg = CFG.replace(append_window=window, poisson_steps=2)
        base = run_pic(cfg.replace(scheduler="sync"), print_header=False)
        dyn = run_pic(cfg.replace(scheduler="dynamic"), print_header=False)
        assert dyn.final_n == base.final_n, window
        np.testing.assert_array_equal(
            sorted_particle_array(base.state), sorted_particle_array(dyn.state)
        )
