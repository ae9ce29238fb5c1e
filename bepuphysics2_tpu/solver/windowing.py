"""Windowed-solve layout: Morton body permutation + segmented-window row grouping.

The windowed Pallas sweeps (ops/sweep.py contact_sweep_win / solve_substeps_contacts_win)
route each 256-row slice against a 512-column WINDOW of the velocity state instead of the
whole body array, which removes the rows x bodies scaling that gated the full-width
kernel at 8,192 bodies (reference identity: the solve loop has no size cliff,
Solver_Solve.cs:297-654). This module builds everything the kernels need, per frame, as
fixed-shape XLA:

- **Body layout** (``body_layout``): all body slots sorted by Morton code of their
  position (spatial locality => contact partners land near each other), prefixed by a
  replicated APPENDIX of up to G non-dynamic bodies (ground planes, kinematic drivers:
  the bodies that touch everything). Replication is sound because the solver never
  writes non-dynamic velocities (zero inverse mass/inertia => zero deltas).
- **Segmented windows**: every slice's window is FOUR 128-column (= 1024-body) segments
  of the permuted state, concatenated. Two slice kinds share one kernel code path:
  - *narrow* (color, lowest-block) groups: segments = [appendix, blk, blk+1, blk+2] —
    rows whose spatial span fits two blocks, the overwhelming majority under Morton
    order;
  - *wide* (color, blockA, blockB) groups: segments = [appendix, blkA, blkB, appendix]
    — Morton-seam crossings; side A indexes segment 1, side B segment 2. The duplicate
    appendix segment is never indexed by a wide row, so its scatter-back adds zero.
  Groups are padded to the slice size; padding rows are invalid (zero impulses, zero
  contact mask) and contribute exactly zero. Wholly-dead slices carry segment0 = -1 and
  the kernel skips them. Wide demand beyond ``wide_cap`` raises the solver overflow
  diagnostic (engine-wide honest-caps pattern) and keeps the rows' warm-start impulses.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..bodies import KIND_DYNAMIC, KIND_EMPTY

GCOLS = 128  # appendix columns (GCOLS*8 = 1024 replicated non-dynamic bodies)
BLK = 1024  # window block, in bodies; MUST equal GCOLS*8 (segment width = 128 cols)
SEGS = 4  # segments per slice window
WIN_BODIES = SEGS * BLK  # bodies addressable by one slice's window


def _morton10(x):
    """Spread 10 bits of x to every 3rd bit (uint32)."""
    x = x & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def _compact(mask, cap):
    """Ascending indices of True (sentinel = mask size), cumsum + sorted scatter."""
    m = mask.shape[0]
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    kept = mask & (rank < cap)
    out = (
        jnp.full(cap + 1, m, jnp.int32)
        .at[jnp.where(kept, rank, cap)]
        .set(jnp.arange(m, dtype=jnp.int32), mode="drop", indices_are_sorted=True)
    )[:cap]
    return out, jnp.sum(mask) > cap


def body_layout(pos, kind):
    """Morton layout of all body slots + non-dynamic appendix.

    Returns a dict:
      pos_slot: (NP,) int32 — body slot at each layout position (NB = dead sentinel);
                NP = G + NB rounded so NP/8 is a multiple of 128, plus 2*BLK overhang
                so every window segment is in-bounds.
      slot_pos: (NB,) int32 — authoritative (spatial) layout position of each slot.
      app_pos:  (NB,) int32 — appendix position of the slot, or -1.
      nch:      int — transposed-state columns (NP // 8).
    """
    nb = kind.shape[0]
    G = GCOLS * 8
    live = kind != KIND_EMPTY
    big = jnp.float32(3.0e38)

    def rng(c):
        lo = jnp.min(jnp.where(live, c, big))
        hi = jnp.max(jnp.where(live, c, -big))
        return lo, jnp.maximum(hi - lo, 1e-6)

    lx, sx = rng(pos.x)
    ly, sy = rng(pos.y)
    lz, sz = rng(pos.z)
    q = lambda c, lo, sp: jnp.clip((c - lo) / sp * 1023.0, 0.0, 1023.0).astype(
        jnp.uint32
    )
    code = (
        _morton10(q(pos.x, lx, sx))
        | (_morton10(q(pos.y, ly, sy)) << 1)
        | (_morton10(q(pos.z, lz, sz)) << 2)
    ).astype(jnp.int32)
    key = jnp.where(live, code, jnp.int32(2**30))  # dead slots last
    order = jnp.argsort(key).astype(jnp.int32)  # slot at spatial rank
    slot_sp = jnp.zeros(nb, jnp.int32).at[order].set(jnp.arange(nb, dtype=jnp.int32))
    slot_pos = G + slot_sp

    nd = live & (kind != KIND_DYNAMIC)
    app_sel, _ = _compact(nd, G)  # slots replicated into the appendix (first G)
    app_pos = (
        jnp.full(nb + 1, -1, jnp.int32)
        .at[jnp.minimum(app_sel, nb)]
        .set(jnp.arange(G, dtype=jnp.int32), mode="drop")
    )[:nb]

    # Layout positions: appendix replicas then the spatial permutation, padded so the
    # highest window segment (blk = nblk-1 + 2) stays in bounds and the column count is
    # a multiple of 128.
    nblk = -(-nb // BLK)
    np_need = G + (nblk + 2) * BLK
    nch = -(-(np_need // 8) // 128) * 128
    NP = nch * 8
    pos_slot = jnp.concatenate(
        [
            jnp.where(app_sel < nb, app_sel, nb)[:G],
            order,
            jnp.full(NP - G - nb, nb, jnp.int32),
        ]
    )
    return dict(
        pos_slot=pos_slot, slot_pos=slot_pos, app_pos=app_pos, nch=nch, nblk=nblk
    )


def permute_rows(x, pos_slot):
    """Gather row-array x (NB, ...) into layout order (NP, ...), zero for sentinels."""
    xp = jnp.concatenate([x, jnp.zeros((1,) + x.shape[1:], x.dtype)])
    return xp[pos_slot]


def row_windows(lay, body_a, body_b, valid, color, num_colors: int, sb: int,
                wide_cap: int):
    """Group bank rows into segmented-window slices; build the padded windowed-exec
    layout + per-slice kernel metadata.

    Returns dict:
      dest:   (B,) int32 — padded-layout row of each bank row (narrow region, wide
              region, or BP sink for invalid/overflowed rows).
      b_n:    int — narrow region size (static bound).
      bp:     int — total padded bank size (b_n + wide_cap).
      n_slices: int — bp // sb.
      wseg:   (n_slices, SEGS) int32 — window segment start COLUMNS (128-aligned);
              wseg[:, 0] == -1 marks a dead slice.
      rel_a/rel_b: (B,) int32 — window-relative body index of each side, in
              [0, WIN_BODIES).
      wide_overflow: () bool — padded wide demand exceeded wide_cap (solver overflow).
    """
    nblk = lay["nblk"]
    G = GCOLS * 8
    C = num_colors
    B = body_a.shape[0]
    NGn = (C + 1) * nblk  # narrow groups: (color incl. Jacobi, lowest block)
    # Wide groups: (blockA, blockB) with NO color key — wide rows always solve
    # mass-split (Jacobi semantics), so conflict-freedom inside a slice is not
    # required and the (C+1)x group-count (and its per-group padding to the slice
    # size) disappears. Measured on a settled 16k pile model: ~6% of rows are wide;
    # (color, blkA, blkB) grouping padded them 19x (244 occupied groups), color-free
    # grouping pads ~4x (42 groups).
    NGw = nblk * nblk

    # One packed (NB, 2) table → one row gather per side (separate slot_pos/app_pos
    # gathers cost ~1.4 ms EACH at 160k rows; width is free up to 128 lanes).
    postab = jnp.stack([lay["slot_pos"], lay["app_pos"]], -1)
    ga = postab[body_a]
    gb = postab[body_b]
    pa = ga[:, 0]
    pb = gb[:, 0]
    aa = ga[:, 1]
    ab = gb[:, 1]
    a_app = aa >= 0
    b_app = ab >= 0
    sp_a = pa - G
    sp_b = pb - G
    lo_sp = jnp.where(
        a_app,
        jnp.where(b_app, 0, sp_b),
        jnp.where(b_app, sp_a, jnp.minimum(sp_a, sp_b)),
    )
    hi_sp = jnp.where(
        a_app,
        jnp.where(b_app, 0, sp_b),
        jnp.where(b_app, sp_a, jnp.maximum(sp_a, sp_b)),
    )
    narrow = valid & (hi_sp - lo_sp <= 2 * BLK)
    wide = valid & ~narrow
    wb = jnp.clip(lo_sp // BLK, 0, nblk - 1)
    blk_a = jnp.clip(sp_a // BLK, 0, nblk - 1)
    blk_b = jnp.clip(sp_b // BLK, 0, nblk - 1)
    col = jnp.clip(color, 0, C)
    key_n = col * nblk + wb  # meaningful where narrow
    key_w = blk_a * nblk + blk_b  # where wide (color-free; mass-split execution)

    # Padded grouping: counts -> SB-padded bases -> rank within group. One combined
    # scatter-add counts BOTH regions (separate passes cost ~1.6 ms each at 16k),
    # and one combined sort serves both (rank only needs to be per-group).
    ckey0 = jnp.where(narrow, key_n, jnp.where(wide, NGn + key_w, NGn + NGw))
    cnt_all = jnp.zeros(NGn + NGw + 1, jnp.int32).at[ckey0].add(1)
    cnt_n = cnt_all[:NGn]
    padded_n = -(-cnt_n // sb) * sb
    base_n = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(padded_n)])
    b_n = B + NGn * sb  # static worst case: every narrow group pays one partial slice

    cnt_w = cnt_all[NGn : NGn + NGw]
    padded_w = -(-cnt_w // sb) * sb
    base_w = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(padded_w)])
    wide_overflow = base_w[NGw] > wide_cap

    bp = b_n + wide_cap
    n_slices = bp // sb

    ckey = ckey0
    order = jnp.argsort(ckey, stable=True).astype(jnp.int32)
    key_s = ckey[order]
    seg_start = jnp.concatenate([jnp.zeros(1, dtype=bool), key_s[1:] != key_s[:-1]])
    idx = jnp.arange(B, dtype=jnp.int32)
    start_idx = jnp.where(seg_start, idx, 0)
    seg_base = jax.lax.associative_scan(jnp.maximum, start_idx)
    rank_s = idx - seg_base
    rank = jnp.zeros(B, jnp.int32).at[order].set(rank_s)

    dest_n = base_n[jnp.minimum(key_n, NGn - 1)] + rank
    dest_w = b_n + base_w[jnp.minimum(key_w, NGw - 1)] + rank
    w_kept = wide & (base_w[jnp.minimum(key_w, NGw - 1)] + rank < wide_cap)
    dest = jnp.where(narrow, dest_n, jnp.where(w_kept, dest_w, bp)).astype(jnp.int32)

    # ---- Per-slice window segments: scatter each live group's segment vector at its
    # start slice, then forward-fill (slices of one group are contiguous).
    n_sl_n = b_n // sb
    n_sl_w = wide_cap // sb

    def _fill(marked):
        """Forward-fill -1 gaps with the latest valid value (select-right-if-valid)."""
        return jax.lax.associative_scan(
            lambda a, b: jnp.where(b >= 0, b, a), marked
        )

    def _group_starts(bases, padded, start_vals, n_sl, extra=0):
        out = (
            jnp.full(n_sl + 1, -1, jnp.int32)
            .at[jnp.where(padded > 0, bases // sb + extra, n_sl)]
            .max(start_vals, mode="drop")
        )[:n_sl]
        return _fill(out)

    g_n = jnp.arange(NGn, dtype=jnp.int32)
    gid_n = _group_starts(base_n[:NGn], padded_n, g_n, n_sl_n)
    used_n = jnp.arange(n_sl_n, dtype=jnp.int32) < (base_n[NGn] // sb)
    wb_sl = jnp.maximum(gid_n, 0) % nblk
    seg_n = jnp.stack(
        [
            jnp.where(used_n & (gid_n >= 0), 0, -1),
            GCOLS + wb_sl * GCOLS,
            GCOLS + (wb_sl + 1) * GCOLS,
            GCOLS + (wb_sl + 2) * GCOLS,
        ],
        axis=1,
    )

    g_w = jnp.arange(NGw, dtype=jnp.int32)
    gid_w = _group_starts(base_w[:NGw], padded_w, g_w, n_sl_w)
    used_w = jnp.arange(n_sl_w, dtype=jnp.int32) < jnp.minimum(
        base_w[NGw], wide_cap
    ) // sb
    wa_sl = jnp.maximum(gid_w, 0) // nblk
    wb2_sl = jnp.maximum(gid_w, 0) % nblk
    seg_w = jnp.stack(
        [
            jnp.where(used_w & (gid_w >= 0), 0, -1),
            GCOLS + wa_sl * GCOLS,
            GCOLS + wb2_sl * GCOLS,
            jnp.zeros(n_sl_w, jnp.int32),  # never indexed by wide rows
        ],
        axis=1,
    )
    wseg = jnp.concatenate([seg_n, seg_w], axis=0)

    # ---- Window-relative body index per side, in [0, WIN_BODIES). Segment k covers
    # window bodies [k*BLK, (k+1)*BLK). Appendix members sit in segment 0.
    rel_n_a = jnp.where(a_app, aa, BLK + sp_a - wb * BLK)
    rel_n_b = jnp.where(b_app, ab, BLK + sp_b - wb * BLK)
    rel_w_a = BLK + sp_a - blk_a * BLK
    rel_w_b = 2 * BLK + sp_b - blk_b * BLK
    rel_a = jnp.where(narrow, rel_n_a, rel_w_a)
    rel_b = jnp.where(narrow, rel_n_b, rel_w_b)
    return dict(
        dest=dest,
        b_n=b_n,
        bp=bp,
        n_slices=n_slices,
        wseg=wseg,
        rel_a=rel_a,
        rel_b=rel_b,
        # (B,) bool: rows executing in the wide region — they need mass-split scales
        # (any two wide rows can share a slice regardless of color).
        wide=wide,
        wide_overflow=wide_overflow,
        # True padded wide demand (rows, pre-cap) — demand-driven wide_cap sizing.
        wide_demand=base_w[NGw],
    )


def scatter_rows(dest, bp, x, fill=0):
    """Scatter bank-row array x (B, ...) into the padded layout (BP, ...)."""
    out = jnp.full((bp + 1,) + x.shape[1:], fill, x.dtype)
    return out.at[dest].set(x, mode="drop")[:bp]
