"""Prototype v2: isolate the in-kernel routing costs.

Variants (all VMEM-resident state (NBc, 8*128), 36 passes):
  A. in-kernel one-hot construction (v1)
  B. precomputed one-hot hi matrices (oh_hi, oh_hi_T bf16) as inputs; lo masks f32
  C. B but gather only (no scatter) — isolates scatter cost
  D. B without the lane-select reduction (keeps matmuls) — isolates lo-select cost
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


def math_block(g):
    x = g * 1.0001 + 0.1
    for _ in range(6):
        x = x * 1.1 - 0.25 * x
    return x - g


def bf16x3(x):
    b1 = x.astype(jnp.bfloat16)
    r = x - b1.astype(jnp.float32)
    b2 = r.astype(jnp.bfloat16)
    b3 = (r - b2.astype(jnp.float32)).astype(jnp.bfloat16)
    return b1, b2, b3


def mm3(oh, x, dtype=jnp.float32):
    b1, b2, b3 = bf16x3(x)
    return (
        jnp.dot(oh, b1, preferred_element_type=dtype)
        + jnp.dot(oh, b2, preferred_element_type=dtype)
        + jnp.dot(oh, b3, preferred_element_type=dtype)
    )


def make_kernel(mode):
    def kernel(ohhi_ref, ohhit_ref, lo_ref, vin_ref, vout_ref, vstate):
        vstate[:] = vin_ref[:]

        def one_pass(p, _):
            oh_hi = ohhi_ref[p]      # (M, NBc) bf16
            oh_hi_t = ohhit_ref[p]   # (NBc, M) bf16
            lo = lo_ref[p]           # (M,) int32
            oh_lo = (
                jax.lax.broadcasted_iota(jnp.int32, (M, 128), 1) == lo[:, None]
            ).astype(jnp.float32)
            v2 = vstate[:]
            R = mm3(oh_hi, v2)       # (M, 1024)
            if mode == "D":
                G = R[:, :8]
            else:
                R3 = R.reshape(M, 8, 128)
                G = jnp.sum(R3 * oh_lo[:, None, :], axis=2)  # (M, 8)
            D = math_block(G)
            if mode == "C":
                vstate[0:1, 0:1] = vstate[0:1, 0:1] + jnp.sum(D).reshape(1, 1) * 1e-30
                return 0
            Dexp = (D[:, :, None] * oh_lo[:, None, :]).reshape(M, 1024)
            dV = mm3(oh_hi_t, Dexp)
            vstate[:] = vstate[:] + dV
            return 0

        jax.lax.fori_loop(0, PASSES, one_pass, 0)
        vout_ref[:] = vstate[:]

    return kernel


def build(mode):
    @jax.jit
    def fn(v2, idx):
        hi = idx // 128
        lo = idx % 128
        oh_hi = (
            jax.lax.broadcasted_iota(jnp.int32, (PASSES, M, NBc), 2) == hi[:, :, None]
        ).astype(jnp.bfloat16)
        oh_hi_t = (
            jax.lax.broadcasted_iota(jnp.int32, (PASSES, NBc, M), 1)
            == hi[:, None, :]
        ).astype(jnp.bfloat16)
        return pl.pallas_call(
            make_kernel(mode),
            out_shape=jax.ShapeDtypeStruct((NBc, 1024), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((NBc, 1024), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
        )(oh_hi, oh_hi_t, lo, v2)

    return fn


@jax.jit
def xla_sweep(v6, idx):
    def one_pass(v6, idx_c):
        g = v6[idx_c]
        d = math_block(g)
        return v6.at[idx_c].add(d), None

    v6, _ = jax.lax.scan(one_pass, v6, idx)
    return v6


def to_v2(v6):
    return np.ascontiguousarray(
        v6.reshape(NBc, 128, 8).transpose(0, 2, 1).reshape(NBc, 1024)
    )


def from_v2(v2):
    return np.asarray(v2).reshape(NBc, 8, 128).transpose(0, 2, 1).reshape(NB, 8)


def main():
    rng = np.random.default_rng(0)
    v6 = rng.normal(size=(NB, 8)).astype(np.float32)
    idx = np.stack([rng.permutation(NB)[:M] for _ in range(PASSES)]).astype(np.int32)
    v2 = jnp.asarray(to_v2(v6))
    idxj = jnp.asarray(idx)

    ref = np.asarray(jax.block_until_ready(xla_sweep(jnp.asarray(v6), idxj)))

    for mode in ["B", "C", "D"]:
        fn = build(mode)
        out = jax.block_until_ready(fn(v2, idxj))
        if mode == "B":
            err = np.max(np.abs(from_v2(out) - ref))
            print(f"mode B max abs err: {err:.3e}")
        t0 = time.perf_counter()
        iters = 50
        for _ in range(iters):
            out = fn(v2, idxj)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"mode {mode}: {dt*1e3:8.3f} ms = {dt/PASSES*1e6:7.2f} us/pass (incl. XLA one-hot build)")


if __name__ == "__main__":
    main()
