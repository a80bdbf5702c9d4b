"""Emulate HORIZON-K worklog scheduling from recorded spawn/death events.

analyse_probe_structure.py showed (bench-point probe, out/data/worklog_probe.npz):
  * current design (t0 = min start in tile, loop runs to T): eff 0.341;
  * start-sorted tiles: 0.497 — the remaining ~50% of slots are POST-DEATH
    idle, which no tiling order can recover (one live lane pins the tile);
  * trailing-exit recovers nothing (children live to T).

Post-death idle is only recoverable by bounding the pass window: sweep each
tile K steps from its own t0 (upper = min(t0+K-1, T)), re-emit survivors as
suspended work (resume = e+1) via the engine's EXISTING suspension encoding.
Dead lanes then waste <= K-1 slots instead of T-death.  Cost: more passes
and more emissions — this script trades them off exactly by replaying the
recorded events under (K, route-buckets) policies.

Emission order replicated from worklog.py: per tile, suspended plane first
(lane order), then child depth planes 0..D-1.  Routing buckets split the
work log into start-homogeneous segment logs (worklog_start_buckets).

Usage: python scripts/probe_horizon.py [npz_path]
"""

import sys

import numpy as np

TILE = 16384
D = 2
INF = np.int64(1 << 40)


def load(path):
    d = np.load(path)
    T = d["spawn_bits"].shape[0]
    cap = d["death_t"].shape[0]
    n0 = int(d["n0"])
    death = d["death_t"].astype(np.int64)
    death[death == 0] = INF
    spawn = np.unpackbits(d["spawn_bits"], axis=1)[:, :cap].astype(bool)
    child_ranges = d["child_ranges"]

    n_spawns = spawn.sum(0).astype(np.int64)
    kmax = int(n_spawns.max())
    spawn_mat = np.full((cap, kmax + 2), INF, np.int64)
    cnt = np.zeros(cap, np.int64)
    ev_slot = np.full((cap, kmax + 2), -1, np.int64)
    start = np.zeros(cap, np.int64)
    start[:n0] = 1
    for t in range(1, T + 1):
        lanes_t = np.nonzero(spawn[t - 1])[0]
        spawn_mat[lanes_t, cnt[lanes_t]] = t
        nb, na = child_ranges[t - 1]
        if na > nb:
            ev_slot[lanes_t, cnt[lanes_t]] = nb + np.arange(len(lanes_t))
            start[nb:na] = t + 1
        cnt[lanes_t] += 1
    n_end = int(child_ranges[-1][1])
    return T, n0, n_end, death, n_spawns, spawn_mat, ev_slot, start


def simulate(T, n0, death, spawn_mat, ev_slot, K=None, buckets=1,
             adaptive=False, sort=False, modular=False, aligned=False):
    """Replay passes under horizon K (None = unbounded) with `buckets`
    start-routed segment logs (REAL per-segment tiling: each segment's tail
    tile pads to TILE, as in worklog.py's seg_rows layout).  `adaptive`
    shrinks the routed bucket count to ceil(prev_entries / (4*TILE)) — the
    host pass loop carries the previous pass's emission total, so the
    kernel can route small passes into fewer segments to cut padding.
    `sort` = full start-sort within one log (not kernel-realizable; upper
    bound reference).  Returns dict of totals."""
    L = np.arange(n0, dtype=np.int64)
    A = np.ones(n0, np.int64)
    C = np.zeros(n0, np.int64)

    slots = 0
    pushes = 0
    tiles = 0
    passes = 0
    entries_total = 0
    max_log = 0

    while len(L):
        passes += 1
        entries_total += len(L)
        max_log = max(max_log, len(L))
        out_parts = []  # per tile: (susp, d0, d1) each (lanes, A, C)

        if sort and passes > 1:
            order = np.argsort(A, kind="stable")
            L, A, C = L[order], A[order], C[order]
            tile_slices = [slice(i, i + TILE) for i in range(0, len(L), TILE)]
        elif buckets > 1 and passes > 1:
            k = buckets
            if adaptive:
                k = int(min(buckets, max(1, -(-len(L) // (4 * TILE)))))
            if modular:
                # window routing: W = K wide windows, wrapped onto k segment
                # logs (within-segment start spread <= K by construction)
                b = ((A - 2) // K) % k
            else:
                b = np.clip((A - 2) * k // max(T, 1), 0, k - 1)
            order = np.argsort(b, kind="stable")
            L, A, C = L[order], A[order], C[order]
            bs = np.searchsorted(b[order], np.arange(k + 1))
            tile_slices = [
                slice(i, min(i + TILE, bs[j + 1]))
                for j in range(k)
                for i in range(bs[j], bs[j + 1], TILE)
            ]
        else:
            tile_slices = [slice(i, i + TILE) for i in range(0, len(L), TILE)]

        for sl in tile_slices:
            Lt, At, Ct = L[sl], A[sl], C[sl]
            t0 = int(At.min())
            if K is None:
                upper = T
            elif aligned:
                # sweep to the end of t0's start-window: resumes then
                # cluster exactly at window boundaries
                upper = min((((t0 - 2) // K) + 1) * K + 1, T)
            else:
                upper = min(t0 + K - 1, T)
            slots += TILE * (upper - t0 + 1)
            tiles += 1

            ran = At <= upper
            s1 = spawn_mat[Lt, Ct]
            s2 = spawn_mat[Lt, Ct + 1]
            d = death[Lt]
            e = np.minimum.reduce([np.full_like(At, upper), d, s2])
            e = np.where(ran, e, At - 1)  # not reached: executes nothing
            pushes += int(np.maximum(0, e - At + 1).sum())

            k1 = ran & (s1 <= e)
            k2 = ran & (s2 <= e)
            dead = ran & (d <= e)
            Cn = Ct + k1.astype(np.int64) + k2.astype(np.int64)

            resume = np.where(ran, e + 1, At)
            susp = ~dead & (resume <= T)
            out_parts.append((Lt[susp], resume[susp], Cn[susp]))
            for kk, col_k in ((k1, Ct), (k2, Ct + 1)):
                ki = np.nonzero(kk)[0]
                cl = ev_slot[Lt[ki], col_k[ki]]
                out_parts.append((cl, spawn_mat[Lt[ki], col_k[ki]] + 1,
                                  np.zeros(len(ki), np.int64)))

        L = np.concatenate([p[0] for p in out_parts]) if out_parts else L[:0]
        A = np.concatenate([p[1] for p in out_parts]) if out_parts else A[:0]
        C = np.concatenate([p[2] for p in out_parts]) if out_parts else C[:0]
        if passes > 4000:
            raise RuntimeError("pass runaway")

    return dict(slots=slots, pushes=pushes, tiles=tiles, passes=passes,
                entries=entries_total, max_log=max_log)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "out/data/worklog_probe.npz"
    T, n0, n_end, death, n_spawns, spawn_mat, ev_slot, start = load(path)
    print(f"T={T} initial={n0} children={n_end - n0}")

    base = simulate(T, n0, death, spawn_mat, ev_slot, K=None, buckets=1)
    print(f"validate vs analyse_probe_structure: slots={base['slots']:,} "
          f"pushes={base['pushes']:,} passes={base['passes']} "
          f"(expect 221,167,616 / 75,422,325 / 13 on the bench probe)")

    # cost model: mobility_ms = steps*c_step + tiles*c_emit + passes*c_pass,
    # calibrated so the CURRENT policy reproduces the measured 45 ms.
    MEAS_MS = 45.0
    base_steps = base["slots"] / TILE

    rows = []
    rows.append(("inf", "1", simulate(T, n0, death, spawn_mat, ev_slot)))
    for K in (64, 48, 32, 24, 16):
        for B in (4, 8):
            r = simulate(T, n0, death, spawn_mat, ev_slot, K=K, buckets=B)
            rows.append((f"{K}", f"{B}", r))
        for B in (2, 3, 4):
            r = simulate(T, n0, death, spawn_mat, ev_slot, K=K, buckets=B,
                         modular=True)
            rows.append((f"{K}", f"{B}m", r))
            r = simulate(T, n0, death, spawn_mat, ev_slot, K=K, buckets=B,
                         modular=True, aligned=True)
            rows.append((f"{K}", f"{B}mA", r))
        r = simulate(T, n0, death, spawn_mat, ev_slot, K=K, sort=True)
        rows.append((f"{K}", "sort", r))

    for c_emit_us, c_pass_ms in ((10, 0.2), (30, 0.3), (60, 0.5)):
        c_step_us = (
            MEAS_MS * 1e3
            - base["tiles"] * c_emit_us
            - base["passes"] * c_pass_ms * 1e3
        ) / base_steps
        print(f"\n--- cost model: c_emit={c_emit_us}us/tile "
              f"c_pass={c_pass_ms}ms c_step={c_step_us:.2f}us ---")
        print(f"{'K':>5} {'B':>5} {'slots':>13} {'eff':>6} {'tiles':>6} "
              f"{'passes':>6} {'maxlog':>9} {'pred_ms':>8}")
        for K, B, r in rows:
            ms = (r["slots"] / TILE * c_step_us
                  + r["tiles"] * c_emit_us) / 1e3 + r["passes"] * c_pass_ms
            print(f"{K:>5} {B:>5} {r['slots']:>13,} "
                  f"{r['pushes']/r['slots']:>6.3f} {r['tiles']:>6} "
                  f"{r['passes']:>6} {r['max_log']:>9,} {ms:>8.1f}")


if __name__ == "__main__":
    main()
