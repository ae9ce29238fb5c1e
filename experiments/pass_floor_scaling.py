"""Find what drives the color-pass cost: index count (cap) vs body count (NB).
Careful timing: sync per repeat, median of repeats."""
import time
import numpy as np
import jax
import jax.numpy as jnp

PASSES = 12
REPEATS = 7


def math_block(g):
    x = g * 1.0001 + 0.1
    for _ in range(6):
        x = x * 1.1 - 0.25 * x
    return x - g


def run(NB, CAP, width=8, variant="scatter"):
    rng = np.random.default_rng(0)
    v6 = jnp.asarray(rng.normal(size=(NB, width)), jnp.float32)
    idx = np.stack([rng.permutation(NB)[: 2 * CAP] for _ in range(PASSES)])
    idx = jnp.asarray(idx, jnp.int32)

    def fn(v6, idx):
        def one_pass(v6, idx_c):
            g = v6[idx_c]
            d = math_block(g)
            return v6.at[idx_c].add(d, unique_indices=True), None

        v6, _ = jax.lax.scan(one_pass, v6, idx)
        return v6

    f = jax.jit(fn)
    jax.block_until_ready(f(v6, idx))
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        jax.block_until_ready(f(v6, idx))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(
        f"NB={NB:6d} cap={CAP:5d} w={width}: {dt/PASSES*1e6:8.1f} us/pass"
        f"  (min {min(ts)/PASSES*1e6:.1f}, max {max(ts)/PASSES*1e6:.1f})"
    )


for NB in [4096, 16384, 65536]:
    for CAP in [512, 2048, 8192]:
        run(NB, min(CAP, NB // 2))
