"""Profile grid2 at 64k under the XLA trace to find where time goes."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from bepuphysics2_tpu.collision import broadphase as bp
from grid2_perf import scene

N = 65536
amin, amax, kind, awake, group = scene(N)


@jax.jit
def f(amin, amax, kind, awake, group):
    pl = bp.grid2(amin, amax, kind, awake, group, 4 * N, 0.0, 24, 64, 7, 1.2)
    return jnp.sum(pl.valid), pl.overflow, jnp.sum(pl.a) + jnp.sum(pl.b)


c, o, s = f(amin, amax, kind, awake, group)
print("pairs", int(c), "overflow", bool(o))
os.system("rm -rf /tmp/jaxtrace")
with jax.profiler.trace("/tmp/jaxtrace"):
    for _ in range(5):
        c, o, s = f(amin, amax, kind, awake, group)
    float(s)
