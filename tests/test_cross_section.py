"""Cross-section table parity with the reference (src/cross_section.cu)."""

import numpy as np
import pytest

from particle_simulation_tpu import cross_section as cs


def test_bundled_table_matches_generator(sine_table):
    np.testing.assert_array_equal(np.asarray(sine_table), cs.generate_table())


def test_energy_to_index_formula():
    # trunc((log10(E)+6)*10000/22) clamped — reference src/cross_section.cu:32-35
    cases = {
        1e-6: 0,
        1.0: int((0 + 6) * 10000 / 22),      # 2727
        1e4: int((4 + 6) * 10000 / 22),      # 4545
        1e16: 9999,                           # above range -> clamp
        1e-12: 0,                             # below range -> clamp
        0.0: 0,                               # log10(0) = -inf -> clamp
    }
    for e, want in cases.items():
        got = int(cs.energy_to_index(np.float32(e)))
        assert got == want, (e, got, want)


def test_energy_to_index_monotone_and_bounded():
    e = np.logspace(-8, 17, 500).astype(np.float32)
    idx = np.asarray(cs.energy_to_index(e))
    assert (np.diff(idx) >= 0).all()
    assert idx.min() == 0 and idx.max() == cs.N_STEPS - 1


def test_load_table_rejects_bad_shape(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("1 2\n3 4\n")
    with pytest.raises(ValueError):
        cs.load_table(str(p))


def test_roundtrip_write_load(tmp_path):
    t = cs.generate_table()
    p = tmp_path / "t.txt"
    cs.write_table(str(p), t)
    np.testing.assert_array_equal(np.asarray(cs.load_table(str(p))), t)


def test_physical_table_shape_and_threshold():
    t = cs.argon_like_table()
    assert t.shape == (cs.N_STEPS, 2)
    assert t.min() >= 0.0 and t.max() <= 100.0
    # ionization is zero below threshold and positive above
    e_ion = 5.54e12
    idx_below = int(cs.energy_to_index(np.float32(e_ion / 10)))
    idx_above = int(cs.energy_to_index(np.float32(e_ion * 4)))
    assert t[idx_below, 0] == 0.0
    assert t[idx_above, 0] > 0.0


def test_physical_table_runs_in_sim(tmp_path):
    import jax.numpy as jnp

    from particle_simulation_tpu import SimConfig
    from particle_simulation_tpu.runtime import run_pic

    p = tmp_path / "argon.txt"
    cs.write_table(str(p), cs.argon_like_table())
    cfg = SimConfig(init_n=100, capacity=1000, poisson_steps=1,
                    poisson_timestep=3, grid_size=(16, 16, 16),
                    cross_section_path=str(p))
    run = run_pic(cfg, print_header=False)
    assert run.final_n > 0
