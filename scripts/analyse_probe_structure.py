"""Offline analysis of out/data/worklog_probe.npz: emulate the worklog
engine's pass/tile structure from the recorded spawn/death events and
compute executed lane-step SLOTS vs actual pushes under

  * the current design (leading-skip only: t0 = min start in tile, loop
    always runs to T);
  * V_exit8: + coarse trailing exit (tile stops at the first multiple of 8
    steps past its last activity);
  * V_sort: work-log entries sorted by start step before tiling;
  * V_sort_exit8: both.

The slot/push ratio bounds how much step time a restructuring can recover:
every slot executes the full T-loop body whether or not the lane is active.
"""

import sys

import numpy as np

TILE = 16384
D = 2


def lane_segments(start, spawn_mat, n_spawns, death, T):
    """Segment starts/ends per lane under the D=2 suspend protocol.

    Returns list of (a, e, pass_offset) arrays is awkward; instead we emit
    flat event lists: for each lane segment: (lane, a, e, seg_idx) with
    seg_idx = 0 for the lane's first segment, k for the k-th resume.
    e = last step the lane EXECUTES in the segment (death/suspend/T bound).
    """
    cap = start.shape[0]
    segs = []  # (lane, a, e, seg_idx)
    a = start.astype(np.int64)
    alive_mask = start > 0
    seg_idx = 0
    while alive_mask.any():
        lanes = np.nonzero(alive_mask)[0]
        aa = a[lanes]
        # spawns available to this segment: global spawn numbers
        # 2*seg_idx, 2*seg_idx+1 (0-based)
        s2 = np.full(lanes.shape, np.int64(1 << 30))
        col = 2 * seg_idx + 1
        if col < spawn_mat.shape[1]:
            has2 = n_spawns[lanes] >= 2 * (seg_idx + 1)
            s2[has2] = spawn_mat[lanes[has2], col]
        dt = death[lanes].astype(np.int64)
        dt = np.where(dt == 0, 1 << 30, dt)
        # suspend step = s2 + 1 (first step after staging the 2nd child)
        u = s2 + 1
        e = np.minimum.reduce([np.full_like(u, T), dt, u - 1])
        segs.append((lanes, aa, e, np.full(lanes.shape, seg_idx)))
        # next segment: only lanes that actually suspended (u <= T and not
        # dead before u; death during the segment kills resumption — death
        # can only occur at an executed step <= e)
        resumed = (u <= T) & (dt > e)
        a2 = np.zeros(cap, np.int64)
        a2[lanes[resumed]] = u[resumed]
        a = a2
        alive_mask = a > 0
        seg_idx += 1
        if seg_idx > 64:
            raise RuntimeError("segment runaway")
    return segs


def main():
    d = np.load("out/data/worklog_probe.npz")
    T = d["spawn_bits"].shape[0]
    cap = d["death_t"].shape[0]
    n0 = int(d["n0"])
    death = d["death_t"]
    spawn = np.unpackbits(d["spawn_bits"], axis=1)[:, :cap].astype(bool)
    child_ranges = d["child_ranges"]

    # per-slot spawn-time matrix
    n_spawns = spawn.sum(0).astype(np.int32)
    kmax = int(n_spawns.max())
    spawn_mat = np.zeros((cap, kmax), np.int32)
    cnt = np.zeros(cap, np.int32)
    for t in range(1, T + 1):
        m = spawn[t - 1]
        idx = np.nonzero(m)[0]
        spawn_mat[idx, cnt[idx]] = t
        cnt[idx] += 1

    # lane start steps: initial lanes start at 1, children at spawn_t + 1
    start = np.zeros(cap, np.int32)
    start[:n0] = 1
    for t in range(1, T + 1):
        nb, na = child_ranges[t - 1]
        start[nb:na] = t + 1
    n_end = int(child_ranges[-1][1])

    segs = lane_segments(start, spawn_mat, n_spawns, death, T)
    pushes = sum(int((e - a + 1).sum()) for _, a, e, _ in segs)
    print(f"lanes: initial {n0}, children {n_end - n0}; pushes {pushes:,}")

    # ---- pass assignment ----
    # pass of (lane, seg): initial lanes seg0 -> pass 1; a child's seg0 ->
    # parent_pass(at staging) + 1; a resume seg k -> previous seg's pass + 1.
    # Children of step t spawned by a parent in whatever segment covered t.
    seg_pass = {}  # (lane, seg_idx) -> pass
    lane_seg_bounds = {}
    for lanes, aa, ee, si in segs:
        for L, a_, e_, s_ in zip(lanes, aa, ee, si):
            lane_seg_bounds[(int(L), int(s_))] = (int(a_), int(e_))
    # which segment of the parent covers step t: seg k covers steps
    # [a_k, e_k] (executed steps; spawns happen at executed steps)
    # Build parent per child: children of step t are [nb, na) ordered by
    # parent slot = spawning lanes sorted
    parent = np.full(cap, -1, np.int64)
    for t in range(1, T + 1):
        nb, na = child_ranges[t - 1]
        if na > nb:
            parent[nb:na] = np.nonzero(spawn[t - 1])[0]

    # pass resolution in slot order: a parent's slot always precedes its
    # children's, so resolving each lane's seg0 + all its resumes before
    # moving on makes every parent fully resolved before its children.
    for L in range(n_end):
        if L < n0:
            seg_pass[(L, 0)] = 1
        else:
            p = int(parent[L])
            t_sp = start[L] - 1
            k = 0
            while True:  # parent segment covering the spawn step
                a_, e_ = lane_seg_bounds[(p, k)]
                if a_ <= t_sp <= e_:
                    break
                k += 1
            seg_pass[(L, 0)] = seg_pass[(p, k)] + 1
        k = 1
        while (L, k) in lane_seg_bounds:
            seg_pass[(L, k)] = seg_pass[(L, k - 1)] + 1
            k += 1

    n_pass = max(seg_pass.values())
    print("passes:", n_pass)

    # per-spawn-event child slot: ev_slot[L, j] = container slot of the
    # child created by lane L's j-th spawn
    ev_slot = np.full((cap, kmax), -1, np.int64)
    for t in range(1, T + 1):
        nb, na = child_ranges[t - 1]
        if na == nb:
            continue
        lanes_t = np.nonzero(spawn[t - 1])[0]
        cols = np.argmax(spawn_mat[lanes_t] == t, axis=1)
        ev_slot[lanes_t, cols] = nb + np.arange(len(lanes_t))

    # segment bounds as per-level (cap,) arrays
    n_levels = max(s for (_, s) in lane_seg_bounds) + 1
    b_a = np.zeros((n_levels, cap), np.int64)
    b_e = np.zeros((n_levels, cap), np.int64)
    for (L, s_), (a_, e_) in lane_seg_bounds.items():
        b_a[s_][L] = a_
        b_e[s_][L] = e_

    # ---- per-pass entry lists in emission order ----
    # pass 1 source: initial lanes in slot order.  Work log for pass p+1 is
    # emitted while sweeping pass p, ordered (source tile; suspended plane
    # before child depth planes; lane position within tile).
    # entries[p] = (lanes, segs, a, e) arrays in entry order
    entries = {
        1: (
            np.arange(n0, dtype=np.int64),
            np.zeros(n0, np.int64),
            b_a[0][:n0].copy(),
            b_e[0][:n0].copy(),
        )
    }
    for p in range(1, n_pass + 1):
        if p not in entries:
            break
        Ls, Ss, As, Es = entries[p]
        pos = np.arange(len(Ls), dtype=np.int64)
        tile = pos // TILE
        ems = []  # (tile, kind, depth, pos, lane, seg, a, e)
        # resumes
        nxt_s = Ss + 1
        valid_lvl = nxt_s < n_levels
        has_next = np.zeros(len(Ls), bool)
        ra = np.zeros(len(Ls), np.int64)
        re = np.zeros(len(Ls), np.int64)
        vl = np.nonzero(valid_lvl)[0]
        ra[vl] = b_a[nxt_s[vl], Ls[vl]]
        re[vl] = b_e[nxt_s[vl], Ls[vl]]
        has_next = ra > 0
        ems.append(
            (tile[has_next], np.zeros(has_next.sum(), np.int64),
             np.zeros(has_next.sum(), np.int64), pos[has_next],
             Ls[has_next], nxt_s[has_next], ra[has_next], re[has_next])
        )
        # children staged this segment (spawn numbers 2s, 2s+1 within [a, e])
        for j01 in (0, 1):
            col = 2 * Ss + j01
            ok = col < n_spawns[Ls]
            t_sp = np.zeros(len(Ls), np.int64)
            ok_i = np.nonzero(ok)[0]
            t_sp[ok_i] = spawn_mat[Ls[ok_i], col[ok_i]]
            ok &= (t_sp >= As) & (t_sp <= Es)
            ok_i = np.nonzero(ok)[0]
            c_slot = ev_slot[Ls[ok_i], col[ok_i]]
            ems.append(
                (tile[ok_i], np.ones(len(ok_i), np.int64),
                 np.full(len(ok_i), j01, np.int64), pos[ok_i],
                 c_slot, np.zeros(len(ok_i), np.int64),
                 b_a[0][c_slot], b_e[0][c_slot])
            )
        cat = [np.concatenate([e[k] for e in ems]) for k in range(8)]
        if len(cat[0]) == 0:
            break
        order = np.lexsort((cat[3], cat[2], cat[1], cat[0]))
        entries[p + 1] = (cat[4][order], cat[5][order], cat[6][order],
                          cat[7][order])

    # ---- slot accounting per variant ----
    def slots(sort_by_start, exit8):
        total = 0
        for p, (Ls, Ss, As, Es) in entries.items():
            a, e = As, Es
            if sort_by_start and p > 1:
                order = np.argsort(a, kind="stable")
                a, e = a[order], e[order]
            n = len(a)
            for i in range(0, n, TILE):
                t0 = int(a[i : i + TILE].min())
                if exit8:
                    t_end = int(e[i : i + TILE].max())
                    n_steps = min(T - t0 + 1, -(-(t_end - t0 + 1) // 8) * 8)
                else:
                    n_steps = T - t0 + 1
                total += TILE * n_steps
        return total

    def slots_bucketed(n_buckets):
        """Work-log entries routed at emission into n_buckets segment logs
        by start-step bucket (emission order preserved within a bucket);
        each segment tiled independently."""
        edges = np.linspace(1, T + 2, n_buckets + 1)
        total = 0
        for p, (Ls, Ss, As, Es) in entries.items():
            if p == 1:
                bucket = np.zeros(len(As), np.int64)
            else:
                bucket = np.clip(
                    np.searchsorted(edges, As, side="right") - 1, 0,
                    n_buckets - 1,
                )
            for b in range(n_buckets):
                a = As[bucket == b]
                for i in range(0, len(a), TILE):
                    t0 = int(a[i : i + TILE].min())
                    total += TILE * (T - t0 + 1)
        return total

    base = slots(False, False)
    v_exit = slots(False, True)
    v_sort = slots(True, False)
    v_both = slots(True, True)
    for B in (2, 4, 8, 16):
        vb = slots_bucketed(B)
        print(f"slots {B:2d}-bucket logs   : {vb:,}  ({pushes/vb:.3f})")
    print(f"pushes                 : {pushes:,}")
    print(f"slots current          : {base:,}  (push efficiency {pushes/base:.3f})")
    print(f"slots +exit8           : {v_exit:,}  ({pushes/v_exit:.3f})")
    print(f"slots +start-sorted    : {v_sort:,}  ({pushes/v_sort:.3f})")
    print(f"slots sorted+exit8     : {v_both:,}  ({pushes/v_both:.3f})")
    # per-pass breakdown, current design
    for p, (Ls, Ss, As, Es) in sorted(entries.items()):
        print(f"  pass {p}: entries {len(Ls):,}, start range "
              f"[{As.min()},{As.max()}]")


if __name__ == "__main__":
    main()
