"""Probe: which gather/scatter forms does Pallas TPU (Mosaic) support in VMEM?

Questions for the solver Pallas kernel (keep (NB,6) velocities VMEM-resident across the
whole color sweep):
  1. vector row gather:   out = v6[idx]         idx: (M,) int32
  2. take_along_axis gather along sublanes
  3. scatter-add:         v6[idx] += delta
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB, M = 4096, 512


def probe(name, fn):
    try:
        out = fn()
        out = jax.block_until_ready(out)
        print(f"OK   {name}: {np.asarray(out).ravel()[:4]}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return False


v6 = jnp.arange(NB * 8, dtype=jnp.float32).reshape(NB, 8)
idx = jnp.asarray(np.random.default_rng(0).integers(0, NB, M), jnp.int32)


# 1. direct fancy indexing
def k1(v_ref, i_ref, o_ref):
    o_ref[:] = v_ref[i_ref[:]]


probe("v_ref[i_ref[:]]", lambda: pl.pallas_call(
    k1,
    out_shape=jax.ShapeDtypeStruct((M, 8), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(v6, idx))


# 2. jnp.take
def k2(v_ref, i_ref, o_ref):
    o_ref[:] = jnp.take(v_ref[:], i_ref[:], axis=0)


probe("jnp.take(v, idx, axis=0)", lambda: pl.pallas_call(
    k2,
    out_shape=jax.ShapeDtypeStruct((M, 8), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(v6, idx))


# 3. take_along_axis on sublane dim
def k3(v_ref, i_ref, o_ref):
    ii = jnp.broadcast_to(i_ref[:][:, None], (M, 8))
    o_ref[:] = jnp.take_along_axis(v_ref[:], ii, axis=0)


probe("take_along_axis axis=0", lambda: pl.pallas_call(
    k3,
    out_shape=jax.ShapeDtypeStruct((M, 8), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(v6, idx))


# 4. scalar loop over M with dynamic slices (fallback, correctness only)
def k4(v_ref, i_ref, o_ref):
    def body(j, _):
        o_ref[j, :] = v_ref[i_ref[j], :]
        return 0

    jax.lax.fori_loop(0, M, body, 0)


probe("scalar fori_loop rows", lambda: pl.pallas_call(
    k4,
    out_shape=jax.ShapeDtypeStruct((M, 8), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.SMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(v6, idx))


# 5. scatter-add via fancy indexing
def k5(v_ref, i_ref, d_ref, o_ref):
    o_ref[:] = v_ref[:]
    o_ref[i_ref[:]] += d_ref[:]


probe("o_ref[idx] += delta", lambda: pl.pallas_call(
    k5,
    out_shape=jax.ShapeDtypeStruct((NB, 8), jnp.float32),
    in_specs=[
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(v6, idx, jnp.ones((M, 8), jnp.float32)))


# 6. one-hot matmul gather (always works; measures MXU fallback cost)
def k6(v_ref, i_ref, o_ref):
    oh = (jax.lax.broadcasted_iota(jnp.int32, (M, NB), 1) == i_ref[:][:, None]).astype(
        jnp.float32
    )
    o_ref[:] = jnp.dot(oh, v_ref[:], preferred_element_type=jnp.float32)


probe("one-hot matmul gather", lambda: pl.pallas_call(
    k6,
    out_shape=jax.ShapeDtypeStruct((M, 8), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(v6, idx))
