"""Packed row gathers — the TPU memory-op shape for pytree indexing.

TPU dynamic gathers move whole ROWS efficiently (the lane dimension amortizes per-row
overhead), but gathers from 1D arrays fetch one scalar per row and run ~30x slower
(measured: (24k,)<-(4k,) scalar gather ≈ 0.3 ms vs (24k,16)<-(4k,16) row gather ≈ 0.1 ms
on v5e). Engine state is a pytree of many small per-entity arrays (the AoSoA analogue of
the reference's BodyDynamics rows, BodyProperties.cs:319), so every indexed hop
(pair → body state, bucket → constraint row, cache hit → impulses) would otherwise issue
dozens of scalar gathers. ``gather_rows`` packs same-dtype leaves into one (N, K) matrix,
gathers once, and unpacks — one row gather per dtype family.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def select_cols(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``take_along_axis(arr, idx, axis=-1)`` for SMALL trailing axes, as VPU math.

    take_along_axis lowers to a per-element dynamic gather on TPU (measured 1-2 ms for a
    (24k, 24) → (24k, 4) pick inside the step program); for small K a broadcast compare +
    masked reduce is pure vector work that XLA fuses into producers/consumers for ~free.
    Use for manifold candidate picks, argmax-chain selections, per-pair child picks —
    anything with a trailing axis of at most a few dozen.

    arr: (..., K); idx: (..., P) int in [0, K) — returns (..., P) of arr.dtype.
    """
    k = arr.shape[-1]
    eq = idx[..., :, None] == jnp.arange(k, dtype=idx.dtype)
    a = arr[..., None, :]
    if arr.dtype == jnp.bool_:
        return jnp.any(eq & a, axis=-1)
    return jnp.sum(jnp.where(eq, a, jnp.zeros((), arr.dtype)), axis=-1)


def select_col(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Single-index variant: ``take_along_axis(arr, idx[..., None], -1)[..., 0]``."""
    return select_cols(arr, idx[..., None])[..., 0]


def _family(dtype) -> str:
    if dtype == jnp.bool_:
        return "bool"
    return "f" if jnp.issubdtype(dtype, jnp.floating) else "i"


def gather_rows(tree, idx):
    """Equivalent of tree_map(lambda x: x[idx], tree) in (at most) three row gathers.

    Every leaf must share the same leading dimension N; trailing dims are flattened into
    pack columns and restored after the gather. bool leaves ride in the int family.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves:
        return tree
    groups: dict = {"f": [], "i": [], "bool": []}
    for li, x in enumerate(leaves):
        groups[_family(x.dtype)].append(li)
    out = [None] * len(leaves)
    for fam, members in groups.items():
        if not members:
            continue
        if len(members) == 1:
            li = members[0]
            out[li] = leaves[li][idx]
            continue
        cols = []
        for li in members:
            x = leaves[li]
            v = x.reshape(x.shape[0], -1)
            if fam == "bool":
                v = v.astype(jnp.int8)
            elif fam == "i":
                v = v.astype(jnp.int32)
            cols.append(v)
        packed = jnp.concatenate(cols, axis=1)
        g = packed[idx]
        off = 0
        for li in members:
            x = leaves[li]
            w = 1
            for d in x.shape[1:]:
                w *= d
            piece = g[:, off : off + w].reshape((idx.shape[0],) + x.shape[1:])
            out[li] = piece.astype(x.dtype)
            off += w
    return jax.tree_util.tree_unflatten(treedef, out)


def compact_true(mask: jnp.ndarray, size: int, fill: int = 0):
    """Sort-based ``nonzero(size=)``: flat indices of True elements in ascending order,
    padded with ``fill``. Returns (idx, count).

    jnp.nonzero lowers to a full-size scatter on TPU — measured ~9 ms per MILLION input
    elements (nonzero over 2M bools = 19 ms; it was the single hottest op family in the
    step). One int32 key sort computes the same compaction ~7x cheaper at every size
    (sort of 2M int32 = 2.5 ms), and the output order is identical (ascending).
    """
    flat = mask.reshape(-1)
    m = flat.shape[0]
    big = jnp.int32(2**31 - 1)
    keys = jnp.where(flat, jnp.arange(m, dtype=jnp.int32), big)
    s = jax.lax.sort(keys, is_stable=False)[:size]
    if m < size:
        # Capacity exceeds the element count (tiny scene, big bank): pad so callers
        # always get exactly ``size`` indices.
        s = jnp.concatenate([s, jnp.full(size - m, big, jnp.int32)])
    count = jnp.sum(flat)
    return jnp.where(s != big, s, fill), count
