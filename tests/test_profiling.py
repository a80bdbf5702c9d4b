"""utils/profiling.py — the nsys-wrapper / CUDA-events analog (SURVEY §5.1)."""

import os

import jax.numpy as jnp

from particle_simulation_tpu.utils import profiling


def test_trace_writes_profile(tmp_path):
    log_dir = str(tmp_path / "trace")
    with profiling.trace(log_dir):
        jnp.sum(jnp.arange(128.0)).block_until_ready()
    # jax.profiler lays out plugins/profile/<run>/*.xplane.pb
    found = [
        os.path.join(root, f)
        for root, _dirs, files in os.walk(log_dir)
        for f in files
    ]
    assert found, "trace() produced no profile files"


def test_device_timer_accumulates():
    with profiling.DeviceTimer() as t:
        x = jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64)))
    assert t.elapsed_s > 0.0
    before = t.elapsed_s
    t.t0 = t.t0  # reuse: stop() adds from the last t0 mark
    assert t.stop(x) >= before


def test_time_fn_returns_median_seconds():
    fn = lambda a: a * 2.0  # noqa: E731
    dt = profiling.time_fn(fn, jnp.ones((8, 128)), iters=3, warmup=1)
    assert dt >= 0.0
