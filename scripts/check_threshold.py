"""Exhaustive CPU validation of the threshold-mode lookup math.

1. _exact_threshold: for random + adversarial chances c, brute-force
   T = #{P : u(P) < c} over the exact boundary neighbourhood must equal the
   windowed estimate (and spot-check with full 2^24 numpy counts for a few).
2. Coarse-decision soundness: for random (bits, bucket) pairs, the packed
   16-bit compare must agree with the exact comparisons whenever it claims
   certainty.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from particle_simulation_tpu.ops.pallas.push_mcc import (
    _exact_threshold,
    pack_threshold_table,
)
from particle_simulation_tpu import rng


def u_of(P):
    return (
        np.float32(np.float32(P) * np.float32(2.0**-24)) * np.float32(100.0)
    )


def main():
    rs = np.random.default_rng(0)
    cs = np.concatenate(
        [
            rs.uniform(0, 100, 2000).astype(np.float32),
            rs.uniform(0, 0.2, 2000).astype(np.float32),
            np.float32([0.0, 100.0, 99.999996, 50.0, 1e-7, 2.0**-20]),
            u_of(rs.integers(0, 1 << 24, 2000)),  # exact grid values
        ]
    )
    T_est = np.asarray(_exact_threshold(jnp.asarray(cs)))

    # brute-force each threshold by scanning the +-64 neighbourhood of the
    # analytic boundary (u is monotone; the window provably contains it)
    P_all = None
    bad = 0
    for c, T in zip(cs, T_est):
        k0 = int(np.floor(float(c) / 100.0 * (1 << 24)))
        lo = max(k0 - 64, 0)
        hi = min(k0 + 64, 1 << 24)
        ps = np.arange(lo, hi, dtype=np.int64)
        us = u_of(ps)
        T_true = lo + int(np.sum(us < c))
        # validate window assumption: boundary strictly inside
        if lo > 0:
            assert u_of(np.int64(lo - 1)) < c or T_true == lo
        if T != T_true:
            bad += 1
            print(f"MISMATCH c={c!r}: est {T} true {T_true}")
    print(f"threshold exactness: {bad} mismatches / {len(cs)}")
    assert bad == 0

    # full-scale spot check (3 values, 2^24 scan each)
    for c in (np.float32(37.5), u_of(12345678), np.float32(0.013)):
        P_all = np.arange(1 << 24, dtype=np.int64) if P_all is None else P_all
        T_true = int(np.sum(u_of(P_all) < c))
        T = int(np.asarray(_exact_threshold(jnp.asarray([c])))[0])
        assert T == T_true, (c, T, T_true)
    print("full-scan spot checks OK")

    # coarse-decision soundness on a random table
    table = np.zeros((10000, 2), np.float32)
    table[:, 0] = rs.uniform(0, 0.2, 10000)
    table[:, 1] = rs.uniform(0, 0.5, 10000)
    table[::97, 0] = 100.0  # some always-split buckets
    packed = np.asarray(pack_threshold_table(jnp.asarray(table)))
    flat = packed.reshape(-1)

    bits = rs.integers(0, 1 << 32, 200000, dtype=np.uint64).astype(np.uint32)
    idx = rs.integers(0, 10000, 200000)
    u = np.asarray(
        rng.uniform_from_bits(jnp.asarray(bits), 0.0, 100.0)
    )
    split = table[idx, 0]
    tot = table[idx, 0] + table[idx, 1]
    th = flat[idx].astype(np.int64) & 0xFFFFFFFF
    ts8 = (th >> 16) & 0xFFFF
    tt8 = th & 0xFFFF
    p8 = (bits >> np.uint32(16)).astype(np.int64)
    s_hit = p8 < ts8
    t_hit = p8 < tt8
    und = (p8 == ts8) | (p8 == tt8)
    dec = ~und
    # certainty claims must match the exact f32 comparisons
    assert np.array_equal(s_hit[dec], (u < split)[dec]), "split mismatch"
    assert np.array_equal(t_hit[dec], (u < tot)[dec]), "tot mismatch"
    print(f"coarse decisions sound on {dec.sum()} decided "
          f"({und.sum()} undecided = {und.mean():.2e} frac)")


if __name__ == "__main__":
    main()
