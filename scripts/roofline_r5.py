"""Roofline / MFU calibration for the headline number (VERDICT r4 #6/#8):
convert pushes/s into achieved lane-op/s and HBM GB/s as fractions of chip
peaks, so "is 1.3e9 pushes/s good for this chip?" has a reproducible answer.

Method
------
* ops/lane-step: trace the EXACT code the kernel runs per mobility step —
  physics.update_particles with the shipped polythresh lookup — at the
  (8, 128) vreg shape and count jaxpr primitives that produce vector
  results (gathers counted separately).  This is a LOWER bound for the
  T-loop body: the work-log staging/emission machinery adds more; the
  probe ladder brackets it (probeconst = physics-only loop rate).
* peaks: public TPU v5e numbers (jax-ml.github.io/scaling-book): MXU
  1.97e14 bf16 FLOP/s, HBM 8.1e11 B/s; VPU peak estimated as
  4 ALUs x (8 x 128) lanes x 0.94 GHz ~= 3.85e12 lane-op/s.

Usage: python scripts/roofline_r5.py [pushes_per_sec]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

VPU_PEAK = 4 * 8 * 128 * 0.94e9     # lane-op/s (estimate, see docstring)
MXU_PEAK = 1.97e14                  # bf16 FLOP/s (public v5e)
HBM_PEAK = 8.1e11                   # B/s (public v5e)


def count_body_ops():
    """Vector-op count of one mobility step per (8,128) tile: the shared
    physics (ops/physics.py) + the shipped lookup (polythresh deg2, packed,
    cand-gated), exactly as the worklog T-loop composes them."""
    from particle_simulation_tpu import SimConfig
    from particle_simulation_tpu.cross_section import load_table
    from particle_simulation_tpu.ops import physics
    from particle_simulation_tpu.ops.pallas.push_mcc import (
        _pad_tables,
        make_chunked_lookup,
        pack_poly_thresholds,
    )

    cfg = SimConfig()
    table = load_table()
    split2d, remove2d, n_chunks = _pad_tables(table)
    aux = pack_poly_thresholds(
        table, 2, pack_bf16=cfg.lookup_poly_pack,
        fold_margin=cfg.lookup_margin_fold and cfg.lookup_poly_pack,
    )
    lookup = make_chunked_lookup(
        n_chunks, cfg.lookup_mode, cfg.lookup_static_chunks,
        poly_degree=cfg.lookup_poly_degree, cand_gate=cfg.lookup_cand_gate,
        poly_pack=cfg.lookup_poly_pack, margin_fold=cfg.lookup_margin_fold,
    )

    shape = (8, 128)
    f = jnp.zeros(shape, jnp.float32)
    i = jnp.zeros(shape, jnp.int32)
    u32 = jnp.zeros(shape, jnp.uint32)
    p = physics.Particles(f, f, f, f, f, f, f, f, f, i, u32, u32)

    def body(p):
        return physics.update_particles(
            p, p.status == -1, 3, jnp.uint32(1), cfg.mobility_dt,
            cfg.sim_size, None, None, cfg.seed,
            lambda e, u, b: lookup(split2d, remove2d, aux, e, u, b),
            rng_mode=cfg.rng_mode, integrator=cfg.integrator,
        )

    jaxpr = jax.make_jaxpr(body)(p)
    vec_ops = 0
    gathers = 0

    def walk(jx):
        nonlocal vec_ops, gathers
        for eqn in jx.eqns:
            for sub in (
                v.val for k, v in eqn.params.items()
                if hasattr(v, "val") and hasattr(v.val, "eqns")
            ):
                walk(sub)
            for k in ("jaxpr", "branches", "call_jaxpr"):
                v = eqn.params.get(k)
                if v is None:
                    continue
                for sub in v if isinstance(v, (tuple, list)) else [v]:
                    walk(sub.jaxpr if hasattr(sub, "jaxpr") else sub)
            outs = [o for o in eqn.outvars if hasattr(o, "aval")]
            if any(getattr(o.aval, "ndim", 0) >= 2 for o in outs):
                if eqn.primitive.name in ("gather", "take_along_axis"):
                    gathers += 1
                else:
                    vec_ops += 1
    walk(jaxpr.jaxpr)
    return vec_ops, gathers


def main(pushes_per_sec=1.32e9):
    vec_ops, gathers = count_body_ops()
    spill = 7.0  # measured ~6-8 cycles of spill traffic per vector op
    lane_ops = pushes_per_sec * vec_ops
    print(f"T-loop body (physics + shipped lookup, traced at (8,128)): "
          f"{vec_ops} vector ops + {gathers} gathers per lane-step "
          f"(lower bound; staging/log machinery extra)")
    print(f"at {pushes_per_sec:.3g} pushes/s:")
    print(f"  lane-ops/s >= {lane_ops:.3g} "
          f"= {lane_ops / VPU_PEAK:.1%} of the ~{VPU_PEAK:.2g} VPU peak")
    eff_peak = VPU_PEAK / spill
    print(f"  spill-adjusted op roofline (measured ~{spill:.0f} cycles/op): "
          f"{eff_peak:.3g} lane-op/s -> engine at "
          f"{lane_ops / eff_peak:.0%} of it")
    # field phase at the bench point (measured, STATUS.md anatomy):
    n = 1.31e6
    gather_bytes = n * 3 * 4 * 2          # packed i32 read + (n,3) write
    deposit_macs = n * 64**3 * 2          # one-hot histogram over 64^3
    t_grid = 17.3e-3
    print(f"field phase (17.3 ms in-loop at w=1.31M): deposit "
          f"{deposit_macs / t_grid:.3g} MAC/s "
          f"({deposit_macs / t_grid / MXU_PEAK:.1%} of MXU peak), "
          f"gather+write {gather_bytes / t_grid:.3g} B/s "
          f"({gather_bytes / t_grid / HBM_PEAK:.2%} of HBM peak — "
          f"random-access latency-bound, not bandwidth-bound)")


if __name__ == "__main__":
    main(*(float(a) for a in sys.argv[1:]))
