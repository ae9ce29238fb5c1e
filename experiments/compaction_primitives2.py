"""Primitive costs (reliable timing): sort/argsort, nonzero, top_k, big row-gather,
scatter-add, 1D permutes — the building blocks of broad phase + solver."""
import numpy as np
import jax
import jax.numpy as jnp
from tpu_bench_util import timed_chain

rng = np.random.default_rng(0)


def mix(c, val):
    """Fold a result back into the carry to keep the dependency chain alive."""
    return c + val.astype(c.dtype).ravel()[:1]


# ---- sorts
for M in [131072, 524288, 2097152]:
    x = jnp.asarray(rng.integers(0, 1 << 30, M), jnp.int32)

    def mk():
        def op(c):
            y = x + c[:1]
            o = jnp.argsort(y, stable=True)
            return c + o[:1]

        return op

    timed_chain(mk, jnp.zeros(1, jnp.int32), tag=f"argsort int32 M={M:8d}")

# ---- nonzero with size
for M in [524288, 2097152, 8388608]:
    b = jnp.asarray(rng.random(M) < 0.02)

    def mk():
        def op(c):
            bb = b ^ (c[:1] > 10**9)
            idx = jnp.nonzero(bb, size=262144, fill_value=0)[0]
            return c + idx[:1].astype(jnp.int32)

        return op

    timed_chain(mk, jnp.zeros(1, jnp.int32), tag=f"nonzero sz=256k M={M:8d}")

# ---- top_k rows
for R, W, K in [(262144, 8, 4), (524288, 16, 8), (65536, 224, 32), (16384, 224, 32)]:
    s = jnp.asarray(rng.normal(size=(R, W)), jnp.float32)

    def mk():
        def op(c):
            v, _ = jax.lax.top_k(s + c[:1], K)
            return c + v[:1, 0]

        return op

    timed_chain(mk, jnp.zeros(1, jnp.float32), tag=f"top_k ({R:7d},{W:3d})->k={K:2d}")

# ---- the old grid's big row gather (N, C) indices into (N, 8) rows
for N, C in [(16384, 224), (65536, 64)]:
    feat = jnp.asarray(rng.normal(size=(N, 8)), jnp.float32)
    cand = jnp.asarray(rng.integers(0, N, (N, C)), jnp.int32)

    def mk():
        def op(c):
            g = feat[(cand + c[:1].astype(jnp.int32)) % N]
            return c + g[0, 0, :1]

        return op

    timed_chain(mk, jnp.zeros(1, jnp.float32), tag=f"row-gather (N={N:6d},{C:3d})x8")

# ---- solver-style gather + scatter-add pass
for NB, CAP in [(4096, 1024), (65536, 8192)]:
    v6 = jnp.asarray(rng.normal(size=(NB, 8)), jnp.float32)
    idx = jnp.asarray(rng.permutation(NB)[:CAP], jnp.int32)

    def mk():
        def op(c):
            g = c[idx]
            d = g * 1.0001 + 0.1
            return c.at[idx].add(d - g, unique_indices=True)

        return op

    timed_chain(mk, v6, tag=f"gather+scatter NB={NB:6d} cap={CAP:5d}")

# ---- 1D permute gathers
M = 524288
order = jnp.asarray(rng.permutation(M), jnp.int32)
x10 = jnp.asarray(rng.normal(size=(M,)), jnp.float32)


def mk():
    def op(c):
        y = c
        for _ in range(10):
            y = y[order]
        return y

    return op


timed_chain(mk, x10, tag=f"10x 1D permute M={M}")
