"""Driver-contract guard: __graft_entry__ must keep compiling and running."""

import importlib.util
import os

import jax
import pytest


def _load():
    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_entry_compiles_and_runs():
    ge = _load()
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert int(out.n) > 0


@pytest.mark.slow
def test_dryrun_multichip():
    ge = _load()
    ge.dryrun_multichip(8)
