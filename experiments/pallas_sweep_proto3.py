"""Prototype v3: fully transposed routing — records lane-major everywhere.

State Vt: (8*128, NBc) f32 — component c, lane l of body (k*128+l) at [c*128+l, k].
Per pass (M records):
  gather:  W = Vt @ oh_hi_T          (1024, M)   [3x bf16 matmuls, exact]
           G = sum over l of W3[(c,l), m] * (lo_m == l)   -> (8, M) sublane reduce
  math:    per-component rows (M,)
  scatter: Dexp[(c,l), m] = D[c, m] * (lo_m == l); Vt += Dexp @ oh_hi (3x bf16, exact)
"""
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
NBc = NB // 128


def math_rows(rows):
    # rows: list of 8 (M,) arrays — representative per-component math
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
    vstate[:] = vin_ref[:]

    def one_pass(p, _):
        oh_hi_t = ohhit_ref[p]   # (NBc, M) bf16
        oh_hi = ohhi_ref[p]      # (M, NBc) bf16
        lo = lo_ref[p]           # (1, M) int32
        oh_lo = (
            jax.lax.broadcasted_iota(jnp.int32, (128, M), 0) == lo
        ).astype(jnp.float32)    # (128, M)

        W = mm3(vstate[:], oh_hi_t)            # (1024, M)
        W3 = W.reshape(8, 128, M)
        G = jnp.sum(W3 * oh_lo[None, :, :], axis=1)  # (8, M)

        rows = [G[c] for c in range(8)]
        drows = math_rows(rows)
        D = jnp.stack(drows)                    # (8, M)

        Dexp = (D[:, None, :] * oh_lo[None, :, :]).reshape(1024, M)
        dV = mm3(Dexp, oh_hi)                   # (1024, NBc)
        vstate[:] = vstate[:] + dV
        return 0

    jax.lax.fori_loop(0, PASSES, one_pass, 0)
    vout_ref[:] = vstate[:]


@jax.jit
def pallas_sweep(vt, idx):
    hi = idx // 128
    lo = idx % 128
    oh_hi_t = (
        jax.lax.broadcasted_iota(jnp.int32, (PASSES, NBc, M), 1) == hi[:, None, :]
    ).astype(jnp.bfloat16)
    oh_hi = (
        jax.lax.broadcasted_iota(jnp.int32, (PASSES, M, NBc), 2) == hi[:, :, None]
    ).astype(jnp.bfloat16)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1024, NBc), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1024, NBc), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(oh_hi_t, oh_hi, lo[:, None, :].reshape(PASSES, 1, M), vt)


@jax.jit
def xla_sweep(v6, idx):
    def one_pass(v6, idx_c):
        g = v6[idx_c]
        d = np_math(g)
        return v6.at[idx_c].add(d), None

    v6, _ = jax.lax.scan(one_pass, v6, idx)
    return v6


def np_math(g):
    x = g * 1.0001 + 0.1
    for _ in range(6):
        x = x * 1.1 - 0.25 * x
    return x - g


def to_vt(v6):  # (NB, 8) -> (1024, NBc): [c*128+l, k] = v6[k*128+l, c]
    return np.ascontiguousarray(
        v6.reshape(NBc, 128, 8).transpose(2, 1, 0).reshape(1024, NBc)
    )


def from_vt(vt):
    return np.asarray(vt).reshape(8, 128, NBc).transpose(2, 1, 0).reshape(NB, 8)


def main():
    rng = np.random.default_rng(0)
    v6 = rng.normal(size=(NB, 8)).astype(np.float32)
    idx = np.stack([rng.permutation(NB)[:M] for _ in range(PASSES)]).astype(np.int32)
    vt = jnp.asarray(to_vt(v6))
    idxj = jnp.asarray(idx)

    ref = np.asarray(jax.block_until_ready(xla_sweep(jnp.asarray(v6), idxj)))
    out = from_vt(jax.block_until_ready(pallas_sweep(vt, idxj)))
    err = np.max(np.abs(out - ref))
    print(f"max abs err vs XLA: {err:.3e}")

    for name, fn, arg in [("pallas", pallas_sweep, vt), ("xla", xla_sweep, jnp.asarray(v6))]:
        r = jax.block_until_ready(fn(arg, idxj))
        t0 = time.perf_counter()
        iters = 50
        for _ in range(iters):
            r = fn(arg, idxj)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt*1e3:8.3f} ms = {dt/PASSES*1e6:7.2f} us/pass")


if __name__ == "__main__":
    main()
