"""Windowed-solve layout: Morton body permutation + (color, window-block) row grouping.

The windowed Pallas sweep (ops/sweep.py contact_sweep_win) routes each 256-row slice
against a fixed 512-column window of the velocity state instead of the whole body
array, which removes the rows x bodies scaling that gated the full-width kernel at
8,192 bodies (reference identity: the solve loop has no size cliff,
Solver_Solve.cs:297-654). This module builds everything the kernel needs, per frame,
as fixed-shape XLA:

- **Body layout** (``body_layout``): all body slots sorted by Morton code of their
  position (spatial locality => contact partners land near each other), prefixed by a
  replicated APPENDIX of up to G non-dynamic bodies (ground planes, kinematic drivers:
  the bodies that touch everything). Replication is sound because the solver never
  writes non-dynamic velocities (zero inverse mass/inertia => zero deltas).
- **Row grouping** (``row_windows``): constraint rows keyed by (color, window-block of
  the lowest spatial endpoint). Rows whose spatial span fits two blocks are "narrow"
  and solve in the windowed kernel — the window covers three consecutive blocks, so
  membership is guaranteed, never checked at solve time. The rare wide rows (span
  beyond two blocks — Morton seam crossings) go to a compacted per-iteration XLA pass;
  rows beyond that capacity raise the solver overflow diagnostic (the engine-wide
  honest-caps pattern), never silently drop.
- Groups are padded to the slice size; padding rows are invalid (zero impulses, zero
  contact mask) and contribute exactly zero. Wholly-dead slices carry window start -1
  and the kernel skips them.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..bodies import KIND_DYNAMIC, KIND_EMPTY

GCOLS = 128  # appendix columns (GCOLS*8 = 1024 replicated non-dynamic bodies)
BLK = 1024  # window block, in bodies (128 columns); window = 3 consecutive blocks
WCOLS = 3 * (BLK // 8)  # spatial window columns per slice


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
                so every window slice is in-bounds.
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
    # last window block (start = G + (NBLK-1)*BLK, extent 3*BLK) stays in bounds and
    # the column count is a multiple of 128.
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
    """Group bank rows by (color incl. Jacobi, window block); build the padded
    windowed-exec layout + per-slice kernel metadata.

    Returns dict:
      dest:   (B,) int32 — padded-layout row of each bank row (narrow region, wide
              region, or BP sink for invalid rows).
      b_r:    int — narrow (kernel) region size; n_slices = b_r // sb.
      bp:     int — total padded bank size (b_r + wide_cap).
      wstart: (n_slices,) int32 window start column, -1 for dead slices.
      whi/wlo:(BP,) int32 window-relative chunk column / lane per row SIDE builders
              (use with dest-scattered sides; see build_side).
      wide_overflow: () bool — wide rows exceeded wide_cap (solver overflow).
    """
    nb = lay["slot_pos"].shape[0]
    nblk = lay["nblk"]
    G = GCOLS * 8
    C = num_colors
    B = body_a.shape[0]
    NG = (C + 1) * nblk

    pa = lay["slot_pos"][body_a]
    pb = lay["slot_pos"][body_b]
    aa = lay["app_pos"][body_a]
    ab = lay["app_pos"][body_b]
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
    col = jnp.clip(color, 0, C)
    key = jnp.where(narrow, col * nblk + wb, NG)

    # Padded grouping: counts -> SB-padded bases -> rank within group.
    cnt = jnp.zeros(NG + 1, jnp.int32).at[key].add(1)
    padded = -(-cnt[:NG] // sb) * sb
    base = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(padded)])
    b_r = B + NG * sb  # static worst case: every group pays one partial slice
    n_slices = b_r // sb

    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    key_s = key[order]
    seg_start = jnp.concatenate(
        [jnp.zeros(1, dtype=bool), key_s[1:] != key_s[:-1]]
    )
    idx = jnp.arange(B, dtype=jnp.int32)
    start_idx = jnp.where(seg_start, idx, 0)
    seg_base = jax.lax.associative_scan(jnp.maximum, start_idx)
    rank_s = idx - seg_base
    rank = jnp.zeros(B, jnp.int32).at[order].set(rank_s)
    dest_narrow = base[jnp.minimum(key, NG - 1)] + rank

    # Wide region: compacted rows after the narrow region.
    wrank = jnp.cumsum(wide.astype(jnp.int32)) - 1
    wide_kept = wide & (wrank < wide_cap)
    wide_overflow = jnp.sum(wide) > wide_cap
    bp = b_r + wide_cap
    dest = jnp.where(
        narrow, dest_narrow, jnp.where(wide_kept, b_r + wrank, bp)
    ).astype(jnp.int32)

    # Per-slice group id: scatter group markers at base//sb, forward-fill with a max
    # scan, then window start from the group's block.
    g_ids = jnp.arange(NG, dtype=jnp.int32)
    marker = (
        jnp.full(n_slices + 1, -1, jnp.int32)
        .at[jnp.where(padded > 0, base[:NG] // sb, n_slices)]
        .max(g_ids, mode="drop")
    )[:n_slices]
    gid = jax.lax.associative_scan(jnp.maximum, marker)
    used = jnp.arange(n_slices, dtype=jnp.int32) < (base[NG] // sb)
    wb_of_slice = jnp.maximum(gid, 0) % nblk
    wstart = jnp.where(used & (gid >= 0), GCOLS + wb_of_slice * (BLK // 8), -1)

    # Window-relative body index per side, for rows that land in the narrow region
    # (wide rows don't use them): appendix members sit at [0, G), spatial members at
    # G + (sp - wb*BLK) where wb is the row's group block.
    rel_a = jnp.where(a_app, aa, G + sp_a - wb * BLK)
    rel_b = jnp.where(b_app, ab, G + sp_b - wb * BLK)
    return dict(
        dest=dest,
        b_r=b_r,
        bp=bp,
        n_slices=n_slices,
        wstart=wstart,
        rel_a=rel_a,
        rel_b=rel_b,
        wide_overflow=wide_overflow,
    )


def scatter_rows(dest, bp, x, fill=0):
    """Scatter bank-row array x (B, ...) into the padded layout (BP, ...)."""
    out = jnp.full((bp + 1,) + x.shape[1:], fill, x.dtype)
    return out.at[dest].set(x, mode="drop")[:bp]
