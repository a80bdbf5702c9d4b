"""Grid-phase (deposit + field gather) strategy shootout on the real chip.

The bench-point step anatomy attributes ~43 ms to the grid phase
(deposit ~19 + field ~24 at 1M/256^3).  Times the current implementations
and layout variants to find the fastest combination.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from particle_simulation_tpu.ops import grid as G


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:50s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    n, g = 1_000_000, 256
    ncells = g * g * g
    gs = (g, g, g)
    cell = 3.90625  # 1000/256
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (n, 3), jnp.float32, 0.0, 1000.0)
    w = jnp.ones((n,), jnp.float32)
    pos = jax.block_until_ready(pos)
    charge = jax.block_until_ready(G.deposit(pos, w, cell, gs))
    e_const = 1.2e-2

    print("--- deposit variants (1M particles, 256^3) ---")
    timeit("a. current deposit (scatter-add i32)", jax.jit(
        lambda p, ww: G.deposit(p, ww, cell, gs)), pos, w)

    @jax.jit
    def dep_f32(p, ww):
        idx = G.cell_indices(p, cell, gs)
        flat = G.flatten_cells(idx[:, 0], idx[:, 1], idx[:, 2], gs)
        z = jnp.zeros((ncells,), jnp.float32)
        return z.at[flat].add(ww)

    timeit("b. scatter-add f32", dep_f32, pos, w)

    @jax.jit
    def dep_noweight(p):
        idx = G.cell_indices(p, cell, gs)
        flat = G.flatten_cells(idx[:, 0], idx[:, 1], idx[:, 2], gs)
        z = jnp.zeros((ncells,), jnp.int32)
        return z.at[flat].add(1)

    timeit("c. scatter-add constant 1 (no weight array)", dep_noweight, pos)

    print("--- field variants ---")
    timeit("d. current packed (cells,3) rows", jax.jit(
        lambda c, p, ww: G.gather_acceleration_packed(c, p, ww, cell, gs, e_const)),
        charge, pos, w)

    @jax.jit
    def field_pad4(c, p, ww):
        acc3 = G.field_grid(c, gs, e_const).reshape(-1, 3)
        acc4 = jnp.pad(acc3, ((0, 0), (0, 1)))
        idx = G.cell_indices(p, cell, gs)
        flat = G.flatten_cells(idx[:, 0], idx[:, 1], idx[:, 2], gs)
        a = acc4.at[flat].get(mode="promise_in_bounds")
        return jnp.where(ww[:, None] > 0, a[:, :3], 0.0)

    timeit("e. (cells,4)-padded rows", field_pad4, charge, pos, w)

    @jax.jit
    def field_planes(c, p, ww):
        cg = c.reshape(g, g, g).astype(jnp.float32)
        zeros = jnp.zeros_like(cg)

        def diff(axis):
            up = jnp.concatenate(
                [jnp.take(cg, jnp.arange(1, g), axis=axis),
                 jnp.take(zeros, jnp.arange(1), axis=axis)], axis=axis)
            dn = jnp.concatenate(
                [jnp.take(zeros, jnp.arange(1), axis=axis),
                 jnp.take(cg, jnp.arange(g - 1), axis=axis)], axis=axis)
            return ((up - dn) * jnp.float32(e_const)).reshape(-1)

        idx = G.cell_indices(p, cell, gs)
        flat = G.flatten_cells(idx[:, 0], idx[:, 1], idx[:, 2], gs)
        comps = [diff(a).at[flat].get(mode="promise_in_bounds") for a in range(3)]
        a = jnp.stack(comps, axis=1)
        return jnp.where(ww[:, None] > 0, a, 0.0)

    timeit("f. 3 separate plane gathers", field_planes, charge, pos, w)

    timeit("g. fused 6-neighbour gather", jax.jit(
        lambda c, p, ww: G.gather_acceleration(c, p, ww, cell, gs, e_const)),
        charge, pos, w)

    timeit("h. materialize acc grid only", jax.jit(
        lambda c: G.field_grid(c, gs, e_const)), charge)

    @jax.jit
    def mat_flat3(c):
        return G.field_grid(c, gs, e_const).reshape(-1, 3)

    timeit("i. materialize + reshape(-1,3)", mat_flat3, charge)

    @jax.jit
    def gather_only(a3, p):
        idx = G.cell_indices(p, cell, gs)
        flat = G.flatten_cells(idx[:, 0], idx[:, 1], idx[:, 2], gs)
        return a3.at[flat].get(mode="promise_in_bounds")

    acc3 = jax.block_until_ready(mat_flat3(charge))
    timeit("j. row gather only (pre-built grid)", gather_only, acc3, pos)

    @jax.jit
    def charge_diff_gather(c, p, ww):
        # gather the 6 neighbour charges as 3 pair-rows from a (cells+2,) f32
        # plane, diffs in registers: traffic = 1 plane build + 3 gathers
        cf = c.astype(jnp.float32)
        idx = G.cell_indices(p, cell, gs)
        flat = G.flatten_cells(idx[:, 0], idx[:, 1], idx[:, 2], gs)
        strides = jnp.array([g * g, g, 1], jnp.int32)
        comps = []
        for a in range(3):
            s = strides[a]
            up = jnp.clip(flat + s, 0, ncells - 1)
            dn = jnp.clip(flat - s, 0, ncells - 1)
            vu = cf.at[up].get(mode="promise_in_bounds")
            vd = cf.at[dn].get(mode="promise_in_bounds")
            oku = (idx[:, a] + 1) < g
            okd = (idx[:, a] - 1) >= 0
            comps.append((jnp.where(oku, vu, 0.0) - jnp.where(okd, vd, 0.0))
                         * jnp.float32(e_const))
        acc = jnp.stack(comps, axis=1)
        return jnp.where(ww[:, None] > 0, acc, 0.0)

    timeit("k. f32-plane 6 scalar gathers, diff in reg", charge_diff_gather,
           charge, pos, w)


if __name__ == "__main__":
    main()


def extra():
    n, g = 1_000_000, 256
    ncells = g * g * g
    gs = (g, g, g)
    cell = 3.90625
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (n, 3), jnp.float32, 0.0, 1000.0)
    w = jnp.ones((n,), jnp.float32)
    charge = jax.block_until_ready(G.deposit(pos, w, cell, gs))
    e_const = 1.2e-2

    @jax.jit
    def build_packed(c):
        cg = c.reshape(g, g, g)
        z = jnp.zeros_like(cg)

        def diff(axis):
            up = jnp.concatenate(
                [jnp.take(cg, jnp.arange(1, g), axis=axis),
                 jnp.take(z, jnp.arange(1), axis=axis)], axis=axis)
            dn = jnp.concatenate(
                [jnp.take(z, jnp.arange(1), axis=axis),
                 jnp.take(cg, jnp.arange(g - 1), axis=axis)], axis=axis)
            return up - dn
        dx, dy, dz = diff(0), diff(1), diff(2)
        B = 1 << 9
        packed = (((dx + B) << 20) | ((dy + B) << 10) | (dz + B)).reshape(-1)
        ok = jnp.max(jnp.maximum(jnp.abs(dx), jnp.maximum(jnp.abs(dy), jnp.abs(dz))))
        return packed, ok

    packed, mx = build_packed(charge)
    packed = jax.block_until_ready(packed)
    print("max |diff| =", int(mx))
    timeit("l. build packed-diff i32 grid", build_packed, charge)

    @jax.jit
    def gather_packed(pk, p, ww):
        idx = G.cell_indices(p, cell, gs)
        flat = G.flatten_cells(idx[:, 0], idx[:, 1], idx[:, 2], gs)
        v = pk.at[flat].get(mode="promise_in_bounds")
        B = 1 << 9
        dx = (v >> 20) - B
        dy = ((v >> 10) & 0x3FF) - B
        dz = (v & 0x3FF) - B
        acc = jnp.stack([dx, dy, dz], axis=1).astype(jnp.float32) * jnp.float32(e_const)
        return jnp.where(ww[:, None] > 0, acc, 0.0)

    timeit("m. single i32 flat gather + unpack", gather_packed, packed, pos, w)

    @jax.jit
    def full_packed_field(c, p, ww):
        pk, _ = build_packed(c)
        return gather_packed(pk, p, ww)

    timeit("n. packed-diff field end-to-end", full_packed_field, charge, pos, w)

    # correctness vs current
    ref = G.gather_acceleration_packed(charge, pos, w, cell, gs, e_const)
    new = full_packed_field(charge, pos, w)
    import numpy as np
    print("bit-exact:", bool(jnp.all(ref == new)))


extra()
