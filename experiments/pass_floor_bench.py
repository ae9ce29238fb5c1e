"""Measure the per-color-pass floor on the real chip for different gather/scatter
formulations. A color pass = gather 2*cap body rows from (NB,8) -> elementwise math ->
scatter-add back. The solver runs ~36 such passes per step (4 substeps x (8 colors +
jacobi)) and BASELINE.md attributes the 4k-body solver interior (~8ms) to them.

Variants:
  A. jnp fancy-index gather + .at[].add scatter        (current engine)
  B. same with unique_indices=True on the scatter
  C. two-level one-hot matmul gather + scatter (MXU)   (cap,NB/128)@(NB/128,128*8)
"""
import functools, time
import numpy as np
import jax
import jax.numpy as jnp

PASSES = 36


def math_block(g):
    # stand-in for contact apply: a few dozen flops per row
    x = g * 1.0001 + 0.1
    for _ in range(6):
        x = x * 1.1 - 0.25 * x
    return x - g


def variant_A(v6, idx, unique=False):
    def one_pass(v6, idx_c):
        g = v6[idx_c]
        d = math_block(g)
        return v6.at[idx_c].add(d, unique_indices=unique), None

    v6, _ = jax.lax.scan(one_pass, v6, idx)
    return v6


def variant_C(v6, idx):
    NB = v6.shape[0]
    CH = NB // 128

    def one_pass(v6, idx_c):
        hi = idx_c // 128
        lo = idx_c % 128
        oh_hi = (
            jax.lax.broadcasted_iota(jnp.int32, (idx_c.shape[0], CH), 1) == hi[:, None]
        ).astype(jnp.float32)
        oh_lo = (
            jax.lax.broadcasted_iota(jnp.int32, (idx_c.shape[0], 128), 1) == lo[:, None]
        ).astype(jnp.float32)
        chunks = v6.reshape(CH, 128 * 8)
        rows = jnp.dot(oh_hi, chunks, preferred_element_type=jnp.float32)  # (cap,128*8)
        g = jnp.einsum("ck,ckf->cf", oh_lo, rows.reshape(-1, 128, 8))
        d = math_block(g)
        dexp = (oh_lo[:, :, None] * d[:, None, :]).reshape(-1, 128 * 8)
        dchunks = jnp.dot(oh_hi.T, dexp, preferred_element_type=jnp.float32)
        return v6 + dchunks.reshape(NB, 8), None

    v6, _ = jax.lax.scan(one_pass, v6, idx)
    return v6


def bench(name, fn, v6, idx, iters=20):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(v6, idx))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(v6, idx)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:8.3f} ms total, {dt/PASSES*1e6:7.1f} us/pass")
    return out


for NB, CAP in [(4096, 512), (65536, 4096)]:
    rng = np.random.default_rng(0)
    v6 = jnp.asarray(rng.normal(size=(NB, 8)), jnp.float32)
    # conflict-free within each pass: a permutation slice per pass
    idx = np.stack([
        rng.permutation(NB)[: 2 * CAP].reshape(2 * CAP) for _ in range(PASSES)
    ])
    idx = jnp.asarray(idx, jnp.int32)
    print(f"--- NB={NB} cap={CAP} (2*cap={2*CAP} rows/pass, {PASSES} passes)")
    a = bench("A fancy+scatter      ", functools.partial(variant_A, unique=False), v6, idx)
    b = bench("B scatter unique     ", functools.partial(variant_A, unique=True), v6, idx)
    c = bench("C one-hot MXU        ", variant_C, v6, idx)
    print("   max|A-C| =", float(jnp.max(jnp.abs(a - c))))
