"""Primitive costs on the real chip: argsort, nonzero(size=), top_k, cumsum —
the building blocks of the replicated-entry grid broad phase."""
import time
import numpy as np
import jax
import jax.numpy as jnp

REP = 5


def t(name, fn, *args):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    ts = []
    for _ in range(REP):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {np.median(ts)*1e3:8.2f} ms")


rng = np.random.default_rng(0)
for M in [131072, 524288, 2097152]:
    x = jnp.asarray(rng.integers(0, 1 << 30, M), jnp.int32)
    t(f"argsort int32 M={M:8d}", lambda x: jnp.argsort(x, stable=True), x)
    t(f"sort    int32 M={M:8d}", lambda x: jnp.sort(x), x)

for M in [524288, 2097152, 8388608]:
    b = jnp.asarray(rng.random(M) < 0.02)
    t(f"nonzero sz=262144 M={M:8d}", lambda b: jnp.nonzero(b, size=262144, fill_value=0)[0], b)
    t(f"cumsum  int32    M={M:8d}", lambda b: jnp.cumsum(b.astype(jnp.int32)), b)

for R, W, K in [(262144, 8, 4), (524288, 8, 4), (65536, 224, 32)]:
    s = jnp.asarray(rng.normal(size=(R, W)), jnp.float32)
    t(f"top_k ({R:7d},{W:3d})->k={K:2d}", lambda s: jax.lax.top_k(s, K)[0], s)

# gather comparison: per-candidate row gather (the old grid's cost center)
for N, C in [(16384, 224), (65536, 64)]:
    feat = jnp.asarray(rng.normal(size=(N, 8)), jnp.float32)
    cand = jnp.asarray(rng.integers(0, N, (N, C)), jnp.int32)
    t(f"row-gather (N={N},{C})x8", lambda f, c: f[c], feat, cand)

# 1D column gathers by a permutation (the new design's only gathers)
for M in [524288]:
    order = jnp.asarray(rng.permutation(M), jnp.int32)
    cols = [jnp.asarray(rng.normal(size=M), jnp.float32) for _ in range(10)]
    t(f"10x 1D permute M={M}", lambda o, *cs: tuple(c[o] for c in cs), order, *cols)
