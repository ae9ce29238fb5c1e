"""Probe solve_substeps_contacts directly at various sizes to isolate a TPU worker
crash seen at tiny scenes (nb=64, sb=128, nch=128)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp
from bepuphysics2_tpu.ops import sweep
from bepuphysics2_tpu.utils.vec import Vec3, Quat, Sym3

def probe(nb, nch, sb, nsl, substeps=4, iters=1):
    rng = np.random.default_rng(0)
    B = nsl * sb
    v6 = jnp.asarray(rng.normal(size=(nb, 6)) * 0.1, jnp.float32)
    pos = Vec3(*(jnp.asarray(rng.normal(size=nb), jnp.float32) for _ in range(3)))
    orn = Quat(jnp.zeros(nb), jnp.zeros(nb), jnp.zeros(nb), jnp.ones(nb))
    im = jnp.ones(nb)
    loc = Sym3(jnp.ones(nb), jnp.zeros(nb), jnp.ones(nb), jnp.zeros(nb), jnp.zeros(nb), jnp.ones(nb))
    gm = jnp.ones(nb, bool)
    imk = jnp.ones(nb, bool)
    ps_t = jnp.zeros((sweep.PS_ROWS, B), jnp.float32)
    ps_t = ps_t.at[sweep.PS_N + 1].set(1.0)  # normal = +y
    ps_t = ps_t.at[sweep.PS_MASK].set(1.0)
    ps_t = ps_t.at[sweep.PS_CFM].set(1.0)
    ps_t = ps_t.at[sweep.PS_VALID].set(1.0)
    imp_t = jnp.zeros((sweep.IMP_ROWS, B), jnp.float32)
    idx2 = jnp.asarray(rng.integers(0, nb, nsl * 2 * sb), jnp.int32)
    scale = jnp.ones(nsl * 2 * sb, jnp.float32)
    out = sweep.solve_substeps_contacts(
        v6, pos, orn, im, loc, gm, imk, ps_t, imp_t, idx2, scale,
        1/240., 240., 1.0, 1.0,
        nch=nch, sb=sb, n_substeps=substeps, n_iters=iters,
        angular_mode=0, gravity=(0., -10., 0.))
    r = float(np.asarray(out[0]).sum())
    print(f"OK nb={nb} nch={nch} sb={sb} nsl={nsl}: {r:.4f}")

import sys
cfg = sys.argv[1] if len(sys.argv) > 1 else "tiny"
if cfg == "tiny":
    probe(64, 128, 128, 5)
elif cfg == "mid":
    probe(4096, 512, 512, 10)
elif cfg == "tiny1":
    probe(64, 128, 128, 1, substeps=1)
elif cfg == "tiny2":
    probe(1024, 128, 128, 5)
elif cfg == "tiny3":
    probe(64, 128, 256, 5)
elif cfg == "tiny4":
    probe(64, 256, 128, 5)
