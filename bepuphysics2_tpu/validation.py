"""Debug validation — the reference's assert-everywhere strategy as a host-side checker.

The reference compiles dense validation into Debug builds: NaN/Inf guards under CHECKMATH
(reference: BepuUtilities/MathChecker.cs:12), solver structural validators
(Solver.cs:348-962 ValidateExistingHandles/ValidateConstraintMaps/
ValidateBatchReferencedHandles), Simulation.ValidateCollidables (Simulation.cs:188).
TPU equivalent: `validate(sim)` pulls the device pytree and asserts the same classes of
invariants; call it between steps in tests/debug sessions. For trap-at-source NaN
debugging use `jax.config.update("jax_debug_nans", True)` (the CHECKMATH analogue).
"""
from __future__ import annotations

import numpy as np


class ValidationError(AssertionError):
    pass


def _check(cond: bool, msg: str):
    if not cond:
        raise ValidationError(msg)


def validate(sim) -> None:
    """Validate the full simulation state. Raises ValidationError with a specific message
    on the first violated invariant."""
    import jax

    if sim._dirty:
        sim._push()
    state = sim._state

    # 1. Finiteness of every leaf (MathChecker.Validate equivalent).
    for path, leaf in jax.tree_util.tree_leaves_with_path(state):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f":
            bad = ~np.isfinite(arr)
            if bad.any():
                name = jax.tree_util.keystr(path)
                idx = np.argwhere(bad)[0]
                raise ValidationError(f"non-finite value in {name} at {idx.tolist()}")

    b = state.bodies
    exists = np.asarray(b.kind) != 0
    kind = np.asarray(b.kind)
    awake = np.asarray(b.awake)

    # 2. Orientation quaternions normalized for existing bodies.
    qn = np.stack([np.asarray(c) for c in b.orn], -1)
    norms = np.linalg.norm(qn, axis=-1)
    off = exists & (np.abs(norms - 1.0) > 1e-3)
    _check(not off.any(), f"unnormalized quaternion at bodies {np.nonzero(off)[0][:5]}")

    # 3. Sleeping dynamics have zero velocity (IslandSleeper invariant).
    vel = np.stack([np.asarray(c) for c in b.vel] + [np.asarray(c) for c in b.omega], -1)
    sleeping = (kind == 1) & ~awake & exists
    moving = sleeping & (np.abs(vel).max(-1) > 0.0)
    _check(not moving.any(), f"sleeping body with velocity: {np.nonzero(moving)[0][:5]}")

    # 4. Statics/kinematics have zero inverse mass & inertia.
    inv_mass = np.asarray(b.inv_mass)
    nd = exists & (kind != 1)
    _check(
        not (nd & (inv_mass != 0.0)).any(),
        f"non-dynamic body with inverse mass: {np.nonzero(nd & (inv_mass != 0))[0][:5]}",
    )

    # 5. Contact cache records reference existing bodies (ValidateConstraintMaps).
    nb = sim.config.body_capacity
    keys = np.asarray(state.cache.key)
    valid = np.asarray(state.cache.valid)
    # b-major keys (collision/narrowphase.py pair_key): key = b * nb + a
    cb, ca = keys[valid] // nb, keys[valid] % nb
    _check(
        bool(((ca >= 0) & (ca < nb) & (cb >= 0) & (cb < nb)).all()),
        "contact cache key out of range",
    )
    if valid.any():
        _check(bool(exists[ca].all() and exists[cb].all()),
               "contact cache references removed body")

    # 6. Joint stores reference existing bodies.
    for name, store in sim.joints.items():
        used = np.nonzero(store.valid)[0] if hasattr(store, "valid") else []
        for slot in used:
            for h in np.atleast_1d(store.bodies[slot]):
                _check(exists[int(h)], f"joint '{name}' slot {slot} references empty body {h}")
