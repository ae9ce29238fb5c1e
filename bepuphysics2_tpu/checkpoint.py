"""Checkpoint/resume: the whole simulation is one pytree (SURVEY §5.4).

The reference has no engine-level serializer — state is reconstructable through public
getters (reference: Bodies.GetDescription Bodies.cs:530, Solver.GetDescription
Solver.cs:1413 incl. accumulated impulses for warm-start preservation). Here the entire
``SimState`` — bodies, contact caches with accumulated impulses, joint impulses — is a
single pytree, so checkpointing is flatten + savez and resume preserves warm starts
bit-exactly.
"""
from __future__ import annotations

import io

import jax
import jax.numpy as jnp
import numpy as np


def state_to_bytes(state) -> bytes:
    """Serialize a SimState (or any pytree of arrays) to npz bytes."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    buf = io.BytesIO()
    np.savez(buf, *[np.asarray(leaf) for leaf in leaves])
    return buf.getvalue()


def state_from_bytes(template, data: bytes):
    """Restore a pytree serialized by ``state_to_bytes``; ``template`` supplies the
    structure (e.g. the current SimState)."""
    leaves, treedef = jax.tree_util.tree_flatten(template)
    with np.load(io.BytesIO(data)) as npz:
        new_leaves = [jnp.asarray(npz[f"arr_{i}"]) for i in range(len(leaves))]
    for old, new in zip(leaves, new_leaves):
        if np.shape(old) != np.shape(new):
            raise ValueError(
                f"checkpoint shape mismatch: {np.shape(new)} vs expected {np.shape(old)} "
                "(was the checkpoint created with different capacities?)"
            )
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
