"""Prototype v4: production skeleton — grid over passes, streamed one-hot blocks,
persistent VMEM state, chunk-of-L routing.

State Vt: (8*L, NB/L) f32 — comp c, sublane l of body (k*L+l) at row c*L+l, col k.
L=8: lane-select over only 8 candidates; matmul K dim = NB/L (good MXU shape).

Per pass p (grid step):
  gather:  W = Vt @ oh_hi_T[p]        (8L, M)  [bf16x3, exact]
           G[c] = sum_l W[(c,l), m] * (lo_m == l)     (8, M) — tiny reduce over L=8
  math:    per-component rows (M,)
  scatter: Dexp[(c,l), m] = D[c, m] * (lo_m == l); Vt += Dexp @ oh_hi[p]
"""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 4096
CAP = 512
M = 2 * CAP
PASSES = 36
L = 8
NCH = NB // L
C8 = 8 * L  # state rows


def math_rows(rows):
    out = []
    for g in rows:
        x = g * 1.0001 + 0.1
        for _ in range(6):
            x = x * 1.1 - 0.25 * x
        out.append(x - g)
    return out


def bf16x3(x):
    b1 = x.astype(jnp.bfloat16)
    r = x - b1.astype(jnp.float32)
    b2 = r.astype(jnp.bfloat16)
    b3 = (r - b2.astype(jnp.float32)).astype(jnp.bfloat16)
    return b1, b2, b3


def mm3(x, oh):
    b1, b2, b3 = bf16x3(x)
    return (
        jnp.dot(b1, oh, preferred_element_type=jnp.float32)
        + jnp.dot(b2, oh, preferred_element_type=jnp.float32)
        + jnp.dot(b3, oh, preferred_element_type=jnp.float32)
    )


def kernel(ohhit_ref, ohhi_ref, lo_ref, vin_ref, vout_ref, vstate):
    p = pl.program_id(0)

    @pl.when(p == 0)
    def _():
        vstate[:] = vin_ref[:]

    oh_hi_t = ohhit_ref[:]   # (NCH, M) bf16
    oh_hi = ohhi_ref[:]      # (M, NCH) bf16
    lo = lo_ref[:]           # (1, M) int32
    oh_lo = (
        jax.lax.broadcasted_iota(jnp.int32, (L, M), 0) == lo
    ).astype(jnp.float32)    # (L, M)

    W = mm3(vstate[:], oh_hi_t)              # (8L, M)
    W3 = W.reshape(8, L, M)
    G = jnp.sum(W3 * oh_lo[None, :, :], axis=1)   # (8, M)

    drows = math_rows([G[c] for c in range(8)])
    D = jnp.stack(drows)                      # (8, M)

    Dexp = (D[:, None, :] * oh_lo[None, :, :]).reshape(C8, M)
    dV = mm3(Dexp, oh_hi)                     # (8L, NCH)
    vstate[:] = vstate[:] + dV

    @pl.when(p == PASSES - 1)
    def _():
        vout_ref[:] = vstate[:]


@jax.jit
def build_onehots(idx):
    hi = idx // L
    lo = (idx % L).astype(jnp.int32)
    oh_hi_t = (
        jax.lax.broadcasted_iota(jnp.int32, (PASSES, NCH, M), 1) == hi[:, None, :]
    ).astype(jnp.bfloat16)
    oh_hi = (
        jax.lax.broadcasted_iota(jnp.int32, (PASSES, M, NCH), 2) == hi[:, :, None]
    ).astype(jnp.bfloat16)
    return oh_hi_t, oh_hi, lo.reshape(PASSES, 1, M)


@jax.jit
def pallas_sweep(vt, oh_hi_t, oh_hi, lo):
    def kern(ohhit_ref, ohhi_ref, lo_ref, vin_ref, vout_ref, vstate):
        return kernel(
            ohhit_ref.at[0], ohhi_ref.at[0], lo_ref.at[0], vin_ref, vout_ref, vstate
        )

    return pl.pallas_call(
        kern,
        grid=(PASSES,),
        in_specs=[
            pl.BlockSpec((1, NCH, M), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, NCH), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C8, NCH), lambda p: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C8, NCH), lambda p: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C8, NCH), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C8, NCH), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(oh_hi_t, oh_hi, lo, vt)


def np_math(g):
    x = g * 1.0001 + 0.1
    for _ in range(6):
        x = x * 1.1 - 0.25 * x
    return x - g


@jax.jit
def xla_sweep(v6, idx):
    def one_pass(v6, idx_c):
        g = v6[idx_c]
        d = np_math(g)
        return v6.at[idx_c].add(d), None

    v6, _ = jax.lax.scan(one_pass, v6, idx)
    return v6


def to_vt(v6):  # (NB, 8) -> (8L, NCH): [c*L+l, k] = v6[k*L+l, c]
    return np.ascontiguousarray(
        v6.reshape(NCH, L, 8).transpose(2, 1, 0).reshape(C8, NCH)
    )


def from_vt(vt):
    return np.asarray(vt).reshape(8, L, NCH).transpose(2, 1, 0).reshape(NB, 8)


def main():
    rng = np.random.default_rng(0)
    v6 = rng.normal(size=(NB, 8)).astype(np.float32)
    idx = np.stack([rng.permutation(NB)[:M] for _ in range(PASSES)]).astype(np.int32)
    vt = jnp.asarray(to_vt(v6))
    idxj = jnp.asarray(idx)

    oh = jax.block_until_ready(build_onehots(idxj))
    ref = np.asarray(jax.block_until_ready(xla_sweep(jnp.asarray(v6), idxj)))
    out = from_vt(jax.block_until_ready(pallas_sweep(vt, *oh)))
    err = np.max(np.abs(out - ref))
    print(f"max abs err vs XLA: {err:.3e}")

    # Timing: kernel only (one-hots prebuilt) vs one-hot build vs XLA baseline.
    def timeit(name, f):
        r = jax.block_until_ready(f())
        t0 = time.perf_counter()
        for _ in range(50):
            r = f()
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / 50
        print(f"{name}: {dt*1e3:8.3f} ms = {dt/PASSES*1e6:7.2f} us/pass")

    timeit("pallas (prebuilt oh)", lambda: pallas_sweep(vt, *oh))
    timeit("onehot build        ", lambda: build_onehots(idxj))
    timeit("xla                 ", lambda: xla_sweep(jnp.asarray(v6), idxj))


if __name__ == "__main__":
    main()
