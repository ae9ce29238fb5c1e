"""grid2 vs grid vs brute perf on the real chip at several N (pile-like scenes)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from bepuphysics2_tpu.collision import broadphase as bp
from bepuphysics2_tpu.utils.vec import Vec3
from bepuphysics2_tpu.bodies import KIND_DYNAMIC, KIND_STATIC


def scene(n, seed=0):
    rng = np.random.default_rng(seed)
    side = int(np.ceil(n ** (1 / 3)))
    g = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"), -1).reshape(-1, 3)[:n]
    c = g * 1.2 + rng.uniform(-0.05, 0.05, (n, 3))
    half = np.full((n, 1), 0.55)  # speculative-expanded-ish boxes, touching neighbors
    amin = (c - half).astype(np.float32)
    amax = (c + half).astype(np.float32)
    kind = np.full(n, KIND_DYNAMIC, np.int32)
    kind[0] = KIND_STATIC
    amin[0] = (-1000, -1, -1000)
    amax[0] = (1000, 0, 1000)
    return (
        Vec3(*(jnp.asarray(amin[:, k]) for k in range(3))),
        Vec3(*(jnp.asarray(amax[:, k]) for k in range(3))),
        jnp.asarray(kind), jnp.ones(n, bool), jnp.zeros(n, jnp.int32),
    )


def timeit(name, fn, amin, amax, kind, awake, group, *static, reps=5):
    @jax.jit
    def f(amin, amax, kind, awake, group):
        pl = fn(amin, amax, kind, awake, group, *static)
        return jnp.sum(pl.valid), pl.overflow, jnp.sum(pl.a) + jnp.sum(pl.b)

    args = (amin, amax, kind, awake, group)

    c, o, s = f(*args)
    c0, o0 = int(c), bool(o)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        c, o, s = f(*args)
        float(s)  # value read = real sync
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {np.median(ts)*1e3:8.2f} ms  pairs={c0} overflow={o0}")


for N in [16384, 65536]:
    amin, amax, kind, awake, group = scene(N)
    mp = 4 * N
    print(f"--- N={N}")
    timeit("grid2", bp.grid2, amin, amax, kind, awake, group, mp, 0.0, 16, 64, 4, 2.0)
    if N <= 16384:
        timeit("grid ", bp.grid, amin, amax, kind, awake, group, mp, 0.0, 16, 64)
        timeit("brute", bp.brute_force, amin, amax, kind, awake, group, mp)
