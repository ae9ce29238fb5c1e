"""Does indices_are_sorted / unique_indices change TPU scatter-add & gather cost?
Reliable chained timing."""
import numpy as np
import jax
import jax.numpy as jnp
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tpu_bench_util import timed_chain

rng = np.random.default_rng(0)

for NB, CAP in [(16384, 16384), (65536, 65536)]:
    idx_u = jnp.asarray(rng.permutation(NB)[:CAP], jnp.int32)
    idx_s = jnp.sort(idx_u)
    v0 = jnp.asarray(rng.normal(size=(NB, 8)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(CAP, 8)), jnp.float32)

    for name, idx, srt in [("unsorted", idx_u, False), ("sorted  ", idx_s, True)]:
        def mk(idx=idx, srt=srt):
            def op(c):
                return c.at[idx].add(d + c[0, :1], unique_indices=True,
                                     indices_are_sorted=srt)
            return op
        timed_chain(mk, v0, tag=f"scatter-add NB={NB:6d} cap={CAP:6d} {name}")

    for name, idx, srt in [("unsorted", idx_u, False), ("sorted  ", idx_s, True)]:
        def mk(idx=idx, srt=srt):
            def op(c):
                g = jnp.take(c, idx, axis=0, indices_are_sorted=srt, unique_indices=True)
                return c + jnp.sum(g) * 1e-9
            return op
        timed_chain(mk, v0, tag=f"gather     NB={NB:6d} cap={CAP:6d} {name}")
EOF
