"""Per-kernel micro-benchmarks — the DemoBenchmarks analogue (reference
DemoBenchmarks/README.md:1-46: per-type constraint micros, collision testers, sweeps,
gather/scatter). Times one fused jit invocation of each kernel family over a fixed batch
with a forced host read as the completion barrier (block_until_ready is unreliable
through the tunneled PJRT backend — see bench.py).

Run: python benchmarks/micro.py [batch]     (TPU or CPU)
Prints one JSON line per micro: {"micro": name, "batch": N, "us_per_call": t,
"ns_per_record": t/N}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
REPS = 30


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]  # sync
    t0 = time.perf_counter()
    for _i in range(REPS):
        r = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    us = (time.perf_counter() - t0) / REPS * 1e6
    print(
        json.dumps(
            {
                "micro": name,
                "batch": N,
                "us_per_call": round(us, 2),
                "ns_per_record": round(us * 1e3 / N, 2),
            }
        )
    )


def main():
    rng = np.random.default_rng(0)

    # ---- gather / scatter primitives (reference GatherScatterBenchmarks) --------------
    table = jnp.asarray(rng.normal(size=(N, 14)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, N), jnp.int32)
    v6 = jnp.asarray(rng.normal(size=(N, 6)), jnp.float32)
    timeit("gather_rows_14", lambda t, i: t[i], table, idx)
    timeit("scatter_add_6", lambda v, i: v.at[i].add(1.0), v6, idx)

    # ---- contact constraint iteration (reference ConstraintBenchmarks Contact4) -------
    from bepuphysics2_tpu.constraints import contact as cm
    from bepuphysics2_tpu.utils.spring import SpringSettings
    from bepuphysics2_tpu.utils.vec import Sym3, Vec2, Vec3

    def mkvec(k=None):
        sh = (N,) if k is None else (N, k)
        return Vec3(*(jnp.asarray(rng.normal(size=sh), jnp.float32) for _ in range(3)))

    ps = cm.ContactPrestep(
        body_a=idx, body_b=jnp.asarray(rng.integers(0, N, N), jnp.int32),
        normal=Vec3(jnp.zeros(N), jnp.ones(N), jnp.zeros(N)),
        offset_a=mkvec(4), offset_b=mkvec(),
        depth=jnp.asarray(rng.uniform(-0.1, 0.1, (N, 4)), jnp.float32),
        contact_mask=jnp.ones((N, 4), bool),
        valid=jnp.ones(N, bool),
        friction=jnp.ones(N),
        spring=SpringSettings(jnp.full(N, 30.0 * 2 * np.pi), jnp.full(N, 2.0)),
        max_recovery_velocity=jnp.full(N, 2.0),
        feature=jnp.zeros((N, 4), jnp.int32),
    )
    imp = cm.ContactImpulses.zeros(N)
    gi = cm.GatheredInertia(jnp.ones(N), Sym3(jnp.ones(N), jnp.zeros(N), jnp.ones(N), jnp.zeros(N), jnp.zeros(N), jnp.ones(N)))
    bv = cm.BodyVel(mkvec(), mkvec())

    def contact_iter(ps, imp, gi, bv):
        kern = cm.prepare(ps, gi, gi, 1 / 240.0, 240.0)
        return cm.apply_iteration(kern, imp, bv, bv, ps.valid)

    timeit("contact4_prepare+iterate", contact_iter, ps, imp, gi, bv)

    # ---- joint constraint iterations, every registered two-body type ------------------
    from bepuphysics2_tpu.constraints.joints import JOINT_TYPES, ONE_BODY_NAMES
    from bepuphysics2_tpu.constraints.joints.base import JointContext

    ctx = JointContext(
        pos_a=mkvec(), orn_a=_unit_quat(rng, N), inertia_a=gi, vel_a=bv,
        pos_b=mkvec(), orn_b=_unit_quat(rng, N), inertia_b=gi, vel_b=bv,
        active=jnp.ones(N, bool),
    )
    for name, cls in sorted(JOINT_TYPES.items()):
        if getattr(cls, "N_BODIES", 2) > 2:
            continue
        p = jnp.asarray(rng.normal(size=(N, cls.N_PRESTEP)), jnp.float32)
        ji = jnp.zeros((N, cls.N_IMPULSE), jnp.float32)
        timeit(
            f"joint_{name}",
            lambda p, ji, ctx, cls=cls: cls.solve(p, ji, ctx, 1 / 240.0, 240.0),
            p, ji, ctx,
        )

    # ---- pair testers (reference CollisionBenchmarks) ---------------------------------
    from bepuphysics2_tpu.collision import testers

    pos_ab = mkvec()
    qa = _unit_quat(rng, N)
    qb = _unit_quat(rng, N)
    sphere_p = jnp.tile(jnp.asarray([[0.5] + [0.0] * 11], jnp.float32), (N, 1))
    caps_p = jnp.tile(jnp.asarray([[0.4, 0.8] + [0.0] * 10], jnp.float32), (N, 1))
    box_p = jnp.tile(jnp.asarray([[0.5, 0.6, 0.7] + [0.0] * 9], jnp.float32), (N, 1))
    timeit("tester_sphere_sphere", testers.sphere_sphere, pos_ab, sphere_p, sphere_p)
    timeit("tester_sphere_box", testers.sphere_box, pos_ab, qb, sphere_p, box_p)
    timeit("tester_capsule_capsule", testers.capsule_capsule, pos_ab, qa, qb, caps_p, caps_p)
    timeit("tester_capsule_box", testers.capsule_box, pos_ab, qa, qb, caps_p, box_p)
    timeit("tester_box_box", testers.box_box, pos_ab, qa, qb, box_p, box_p)

    # generic GJK/MPR kernel (the fallback every uncovered pair pays)
    from bepuphysics2_tpu.collision.convex import SupportCtx, generic_convex_manifold
    from bepuphysics2_tpu.shapes.registry import BOX, CYLINDER

    cyl_p = jnp.tile(jnp.asarray([[0.4, 0.6] + [0.0] * 10], jnp.float32), (N, 1))
    ctx_g = SupportCtx(
        type_a=jnp.full(N, BOX, jnp.int32), params_a=box_p,
        type_b=jnp.full(N, CYLINDER, jnp.int32), params_b=cyl_p,
        orn_ab=qa, pos_ab=pos_ab, hull_points=None,
        hull_start_a=jnp.zeros(N, jnp.int32), hull_count_a=jnp.zeros(N, jnp.int32),
        hull_start_b=jnp.zeros(N, jnp.int32), hull_count_b=jnp.zeros(N, jnp.int32),
    )
    timeit("generic_gjk_mpr_box_cylinder", generic_convex_manifold, ctx_g, qa)

    # ---- scene raycast at the 64k scale: full O(R*N) pass vs top-K pruned candidate
    # pass (the BVH-descent analogue; reference Trees/Tree_RayCast.cs:137,
    # RayBatcher.cs:125). A character-controller support ray in a big world is the
    # motivating workload.
    _raycast_micro(rng)


def _raycast_micro(rng, nb=None, n_rays=128):
    import os as _os

    from bepuphysics2_tpu.bodies import BodyState
    from bepuphysics2_tpu.collision.raycast import ray_cast_all
    from bepuphysics2_tpu.shapes.registry import ShapeRegistry, Sphere
    from bepuphysics2_tpu.utils.vec import Quat, Sym3, Vec3

    nb = nb or int(_os.environ.get("RAY_BODIES", 65536))
    reg = ShapeRegistry()
    sid = reg.add(Sphere(0.5))
    shapes = reg.device()

    side = int(np.ceil(np.sqrt(nb)))
    ix = np.arange(nb) % side
    iz = np.arange(nb) // side
    px = (ix - side / 2) * 1.5
    pz = (iz - side / 2) * 1.5
    py = rng.uniform(0.0, 4.0, nb)
    zeros = jnp.zeros(nb, jnp.float32)
    ones = jnp.ones(nb, jnp.float32)
    state = BodyState(
        pos=Vec3(jnp.asarray(px, jnp.float32), jnp.asarray(py, jnp.float32),
                 jnp.asarray(pz, jnp.float32)),
        orn=Quat(zeros, zeros, zeros, ones),
        vel=Vec3(zeros, zeros, zeros), omega=Vec3(zeros, zeros, zeros),
        inv_mass=ones, inv_inertia=Sym3(ones, zeros, ones, zeros, zeros, ones),
        kind=jnp.ones(nb, jnp.int32), awake=jnp.ones(nb, bool),
        shape=jnp.full(nb, sid, jnp.int32),
        friction=ones, spring_frequency=30.0 * ones, spring_damping=ones,
        max_recovery_velocity=2.0 * ones, sleep_threshold=zeros, sleep_timer=zeros,
        sleep_island=jnp.zeros(nb, jnp.int32),
        collision_group=jnp.zeros(nb, jnp.int32),
        continuity=jnp.zeros(nb, jnp.int32),
        spec_margin_min=zeros, spec_margin_max=0.1 * ones,
    )
    r_ix = rng.integers(0, nb, n_rays)
    o = Vec3(jnp.asarray(px[r_ix], jnp.float32), jnp.full(n_rays, 10.0, jnp.float32),
             jnp.asarray(pz[r_ix], jnp.float32))
    d = Vec3(jnp.zeros(n_rays, jnp.float32), jnp.full(n_rays, -1.0, jnp.float32),
             jnp.zeros(n_rays, jnp.float32))

    import functools

    full = jax.jit(functools.partial(ray_cast_all, max_t=30.0))
    pruned = jax.jit(functools.partial(ray_cast_all, max_t=30.0, prune_k=64))
    h_full = full(state, shapes, o, d)
    h_pruned = pruned(state, shapes, o, d)
    # Full agreement = same hit flag, same body, AND matching t (a pruned pass that
    # returns the right body with a wrong t, or flips hit/miss vs max_t, must not
    # count as agreeing). Also report how many rays saturated the K budget (possibly
    # inexact by construction — collision/raycast.py RayHit.saturated).
    hf, hp = np.asarray(h_full.hit), np.asarray(h_pruned.hit)
    agree = int(np.sum(
        (hf == hp)
        & (np.asarray(h_full.body) == np.asarray(h_pruned.body))
        & np.isclose(np.asarray(h_full.t), np.asarray(h_pruned.t), rtol=1e-5,
                     atol=1e-5)
    ))
    saturated = int(np.sum(np.asarray(h_pruned.saturated)))
    for name, fn in (("raycast_full_64k", full), ("raycast_pruned_k64_64k", pruned)):
        t0 = time.perf_counter()
        for _ in range(REPS):
            r = fn(state, shapes, o, d)
        _ = np.asarray(r.t)[:1]
        us = (time.perf_counter() - t0) / REPS * 1e6
        print(json.dumps({
            "micro": name, "batch": n_rays, "bodies": nb,
            "us_per_call": round(us, 2), "agree": agree, "saturated": saturated,
        }))


def _unit_quat(rng, n):
    from bepuphysics2_tpu.utils.vec import Quat

    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return Quat(*(jnp.asarray(q[:, i], jnp.float32) for i in range(4)))


if __name__ == "__main__":
    main()
