"""Prototype: Pallas color-sweep with VMEM-resident body state and exact one-hot
MXU routing (bf16x3 split: one-hot columns make each partial product exact, so the
3-way bf16 decomposition reconstructs f32 gathers/scatters bit-faithfully).

Measures the in-kernel per-pass floor to validate the mega-kernel design:
  - body state V: (NBc, 8*128) f32 scratch, component c of body (k*128+l) at [k, c*128+l]
  - per pass: gather 2cap rows -> math -> scatter-add back, all in VMEM
Compares numerics + time against the XLA fancy-index reference.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 4096
CAP = 512
M = 2 * CAP  # rows touched per pass
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


def sweep_kernel(idx_ref, vin_ref, vout_ref, vstate):
    # Load state into scratch once.
    vstate[:] = vin_ref[:]

    def one_pass(p, _):
        idx = idx_ref[p, :]  # (M,)
        hi = idx // 128
        lo = idx % 128
        oh_hi = (
            jax.lax.broadcasted_iota(jnp.int32, (M, NBc), 1) == hi[:, None]
        ).astype(jnp.bfloat16)
        v2 = vstate[:]
        b1, b2, b3 = bf16x3(v2)
        R = (
            jnp.dot(oh_hi, b1, preferred_element_type=jnp.float32)
            + jnp.dot(oh_hi, b2, preferred_element_type=jnp.float32)
            + jnp.dot(oh_hi, b3, preferred_element_type=jnp.float32)
        )  # (M, 1024)
        oh_lo = (
            jax.lax.broadcasted_iota(jnp.int32, (M, 128), 1) == lo[:, None]
        ).astype(jnp.float32)
        R3 = R.reshape(M, 8, 128)
        G = jnp.sum(R3 * oh_lo[:, None, :], axis=2)  # (M, 8)

        D = math_block(G)  # (M, 8)

        Dexp = (D[:, :, None] * oh_lo[:, None, :]).reshape(M, 1024)
        d1, d2, d3 = bf16x3(Dexp)
        oh_hi_t = oh_hi.T  # (NBc, M)
        dV = (
            jnp.dot(oh_hi_t, d1, preferred_element_type=jnp.float32)
            + jnp.dot(oh_hi_t, d2, preferred_element_type=jnp.float32)
            + jnp.dot(oh_hi_t, d3, preferred_element_type=jnp.float32)
        )
        vstate[:] = vstate[:] + dV
        return 0

    jax.lax.fori_loop(0, PASSES, one_pass, 0)
    vout_ref[:] = vstate[:]


@jax.jit
def pallas_sweep(v2, idx):
    return pl.pallas_call(
        sweep_kernel,
        out_shape=jax.ShapeDtypeStruct((NBc, 1024), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((NBc, 1024), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(idx, v2)


@jax.jit
def xla_sweep(v6, idx):
    def one_pass(v6, idx_c):
        g = v6[idx_c]
        d = math_block(g)
        return v6.at[idx_c].add(d), None

    v6, _ = jax.lax.scan(one_pass, v6, idx)
    return v6


def to_v2(v6):  # (NB, 8) -> (NBc, 1024)
    return np.ascontiguousarray(
        v6.reshape(NBc, 128, 8).transpose(0, 2, 1).reshape(NBc, 1024)
    )


def from_v2(v2):
    return np.asarray(v2).reshape(NBc, 8, 128).transpose(0, 2, 1).reshape(NB, 8)


def main():
    rng = np.random.default_rng(0)
    v6 = rng.normal(size=(NB, 8)).astype(np.float32)
    # conflict-free per pass: a permutation slice per pass
    idx = np.stack([rng.permutation(NB)[:M] for _ in range(PASSES)]).astype(np.int32)

    v2 = jnp.asarray(to_v2(v6))
    idxj = jnp.asarray(idx)

    ref = np.asarray(jax.block_until_ready(xla_sweep(jnp.asarray(v6), idxj)))
    out = from_v2(jax.block_until_ready(pallas_sweep(v2, idxj)))
    err = np.max(np.abs(out - ref))
    rel = err / max(1e-9, np.max(np.abs(ref)))
    print(f"max abs err vs XLA: {err:.3e} (rel {rel:.3e})")

    for name, fn, arg in [("pallas", pallas_sweep, v2), ("xla", xla_sweep, jnp.asarray(v6))]:
        r = jax.block_until_ready(fn(arg, idxj))
        t0 = time.perf_counter()
        iters = 50
        for _ in range(iters):
            r = fn(arg, idxj)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt*1e3:8.3f} ms / {PASSES} passes = {dt/PASSES*1e6:7.2f} us/pass")


if __name__ == "__main__":
    main()
