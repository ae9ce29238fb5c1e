"""Reliable TPU micro-timing through the axon tunnel.

block_until_ready() is NOT a barrier here (the tunneled PJRT backend reports donated /
remote buffers ready immediately — see bench.py sync note). The only reliable sync is
READING a value. This harness times a jitted function that repeats `op` R times with a
dependency chain and returns a scalar; cost-per-op = (T(R2) - T(R1)) / (R2 - R1), which
also cancels dispatch latency and the final reduction.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp


def timed_chain(make_op, init, r1=2, r2=12, reps=5, tag=""):
    """make_op: () -> (fn carry -> carry); init: carry pytree. Returns ms per op."""

    def run(R):
        op = make_op()

        @jax.jit
        def f(carry):
            def body(i, c):
                return op(c)

            c = jax.lax.fori_loop(0, R, body, carry)
            return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(c))

        # warm
        float(f(init))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(init))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1, t2 = run(r1), run(r2)
    per = (t2 - t1) / (r2 - r1)
    print(f"{tag}: {per*1e3:9.3f} ms/op   (R{r1}={t1*1e3:.1f}ms R{r2}={t2*1e3:.1f}ms)")
    return per
