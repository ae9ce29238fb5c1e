"""Verify the TPU gather/scatter cost model for the solver's (NB, w) row accesses.

Hypothesis: each gathered row costs one (8, 128) VMEM tile fetch (~4 KB), so
  - cost ~ M (rows gathered), independent of row width w <= 128
  - clustered/sorted indices that hit the same tile may be cheaper (tile reuse)
Timing: chained dependent ops, (long - short)/(reps_long - reps_short) to cancel
dispatch latency (~35 ms through the tunnel).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

R_SHORT, R_LONG = 4, 64


def timed(make_op, x0, tag):
    def chain(n):
        @jax.jit
        def f(x):
            for _ in range(n):
                x = make_op()(x)
            return x
        return f

    fs, fl = chain(R_SHORT), chain(R_LONG)
    outs = jax.block_until_ready(fs(x0))  # compile
    outl = jax.block_until_ready(fl(x0))
    ts = time.perf_counter(); jax.block_until_ready(fs(x0)); ts = time.perf_counter() - ts
    tl = time.perf_counter(); jax.block_until_ready(fl(x0)); tl = time.perf_counter() - tl
    per = (tl - ts) / (R_LONG - R_SHORT) * 1e3
    print(f"{tag}: {per:7.3f} ms/op")
    return per


rng = np.random.default_rng(0)
NB = 65536
for W in (8, 16, 128):
    v = jnp.asarray(rng.normal(size=(NB, W)), jnp.float32)
    for M in (16384, 65536, 131072):
        idx_r = jnp.asarray(rng.integers(0, NB, M), jnp.int32)
        idx_s = jnp.sort(idx_r)
        # clustered: M/8 random tiles, 8 consecutive rows each, sorted
        tiles = rng.integers(0, NB // 8, M // 8)
        idx_c = jnp.sort(jnp.asarray(
            (tiles[:, None] * 8 + np.arange(8)[None, :]).reshape(-1), jnp.int32))
        for name, idx, srt in (
            ("rand", idx_r, False), ("sort", idx_s, True), ("clus", idx_c, True)
        ):
            def mk(idx=idx, srt=srt):
                def op(x):
                    g = jnp.take(x, idx, axis=0, indices_are_sorted=srt)
                    # data-dep so the chain can't collapse; cheap elementwise
                    return x + jnp.sum(g[:, :1]) * 1e-12
                return op
            timed(mk, v, f"gather W={W:3d} M={M:6d} {name}")
print()
# scatter-add with same index sets, W=8
W = 8
v = jnp.asarray(rng.normal(size=(NB, W)), jnp.float32)
for M in (16384, 131072):
    d = jnp.asarray(rng.normal(size=(M, W)), jnp.float32)
    idx_r = jnp.asarray(rng.integers(0, NB, M), jnp.int32)
    idx_s = jnp.sort(idx_r)
    for name, idx, srt in (("rand", idx_r, False), ("sort", idx_s, True)):
        def mk(idx=idx, srt=srt):
            def op(x):
                return x.at[idx].add(d + x[0, :1], indices_are_sorted=srt)
            return op
        timed(mk, v, f"scat-add W={W} M={M:6d} {name}")
