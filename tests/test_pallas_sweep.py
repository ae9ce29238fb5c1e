"""Pallas color-sweep kernel equivalence vs the XLA solver path.

The kernel (ops/sweep.py) must reproduce the XLA bucketed solve: same color layout,
same math, routing exact by construction (bf16x3 one-hot). Run the same scene through
both backends (kernel in interpreter mode on CPU) and compare trajectories."""
import numpy as np
import pytest

import bepuphysics2_tpu as bp


def _pile_sim(backend):
    sim = bp.Simulation(
        bp.SimConfig(
            body_capacity=64,
            max_pairs=256,
            substeps=2,
            num_colors=4,
            velocity_iterations=2,
            solver_backend=backend,
            enable_sleep=False,
        )
    )
    ground = sim.add_shape(bp.Box(20.0, 0.5, 20.0))
    sim.add_static(bp.StaticDescription(position=(0, -0.5, 0), shape=ground))
    s = bp.Sphere(0.5)
    ss = sim.add_shape(s)
    b = bp.Box(0.4, 0.4, 0.4)
    bs = sim.add_shape(b)
    rng = np.random.default_rng(11)
    for i in range(24):
        x, z = rng.uniform(-1.2, 1.2, 2)
        y = 0.6 + 0.85 * (i // 8)
        if i % 2 == 0:
            sim.add_body(bp.BodyDescription.dynamic((x, y, z), ss, 1.0, s))
        else:
            sim.add_body(bp.BodyDescription.dynamic((x, y, z), bs, 1.0, b))
    return sim


def _states(sim):
    sim._sync_from_device()
    h = sim._host
    return np.stack([h.px, h.py, h.pz]), np.stack([h.vx, h.vy, h.vz])


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
def test_pallas_matches_xla_pile():
    sim_x = _pile_sim("xla")
    sim_p = _pile_sim("pallas")
    dt = 1 / 60.0
    sim_x.run(20, dt)
    sim_p.run(20, dt)
    px, vx = _states(sim_x)
    pp, vp = _states(sim_p)
    # Math is identical; only f32 op ordering differs inside the kernel. After 20
    # frames of stacked contact, positions must agree tightly.
    assert np.max(np.abs(px - pp)) < 5e-3, np.max(np.abs(px - pp))
    assert np.median(np.abs(px - pp)) < 1e-4
    # No NaNs, bodies settled onto/near the ground plane.
    assert np.isfinite(pp).all() and np.isfinite(vp).all()
    # Dynamic bodies (slot 0 is the static ground) stay above the ground plane.
    assert (pp[1][1:25] > -0.2).all()


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
def test_windowed_matches_xla_pile():
    """Windowed-state kernel (ops/sweep.py contact_sweep_win + solver/windowing.py,
    forced small via backend='pallas_win'): the solve math is identical to the XLA
    path; only the Gauss-Seidel slice ORDER differs (rows regroup by (color, Morton
    block)), so short trajectories must agree tightly and remain physical."""
    sim_x = _pile_sim("xla")
    sim_w = _pile_sim("pallas_win")
    dt = 1 / 60.0
    sim_x.run(3, dt)
    sim_w.run(3, dt)
    px, vx = _states(sim_x)
    pw, vw = _states(sim_w)
    # Reorder noise grows chaotically from ~1e-7/step; 3 steps of stacked contact
    # stay within a millimeter (same bound scale as the full-width kernel's 20-step
    # tolerance above).
    assert np.max(np.abs(px - pw)) < 2e-3, np.max(np.abs(px - pw))
    assert not bool(sim_w.last_diag.overflow)
    sim_x.run(17, dt)
    sim_w.run(17, dt)
    px, vx = _states(sim_x)
    pw, vw = _states(sim_w)
    # 20 steps: the reordered Gauss-Seidel iterate genuinely differs, so the envelope
    # is looser than the full-width kernel's (which keeps the XLA slice order).
    assert np.max(np.abs(px - pw)) < 2e-2, np.max(np.abs(px - pw))
    assert np.median(np.abs(px - pw)) < 1e-3
    assert np.isfinite(pw).all() and np.isfinite(vw).all()
    assert (pw[1][1:25] > -0.2).all()


def test_windowing_row_groups():
    """Unit checks on the windowed layout builder: every row's endpoints fall inside
    its slice's 4-segment window at the window-relative index the layout reports;
    appendix holds non-dynamic bodies; padding slices dead."""
    import jax.numpy as jnp

    from bepuphysics2_tpu.bodies import KIND_DYNAMIC, KIND_STATIC
    from bepuphysics2_tpu.solver import windowing as wd
    from bepuphysics2_tpu.utils.vec import Vec3

    rng = np.random.default_rng(5)
    nb = 512
    pos = Vec3(*(jnp.asarray(rng.uniform(-50, 50, nb).astype(np.float32))
                 for _ in range(3)))
    kind = jnp.asarray(
        np.where(rng.uniform(size=nb) < 0.05, KIND_STATIC, KIND_DYNAMIC)
    ).astype(jnp.int32)
    # NOTE: not jitted standalone — body_layout returns trace-time ints (nch, nblk)
    # that downstream code uses as shapes; in production it traces inside the step.
    lay = wd.body_layout(pos, kind)
    slot_pos = np.asarray(lay["slot_pos"])
    app_pos = np.asarray(lay["app_pos"])
    pos_slot = np.asarray(lay["pos_slot"])
    # Appendix replicates exactly the non-dynamic slots (few enough to fit).
    nd = np.asarray(kind) != KIND_DYNAMIC
    assert set(np.nonzero(app_pos >= 0)[0]) == set(np.nonzero(nd)[0])
    # slot_pos is a permutation of the spatial range.
    assert sorted(slot_pos.tolist()) == list(range(1024, 1024 + nb))

    B = 256
    sb = 64
    a = jnp.asarray(rng.integers(0, nb, B).astype(np.int32))
    b = jnp.asarray(rng.integers(0, nb, B).astype(np.int32))
    valid = jnp.asarray(rng.uniform(size=B) < 0.9)
    color = jnp.asarray(rng.integers(0, 5, B).astype(np.int32))  # C=4 + jacobi
    rw = wd.row_windows(lay, a, b, valid, color, num_colors=4, sb=sb, wide_cap=192)
    dest = np.asarray(rw["dest"])
    wseg = np.asarray(rw["wseg"])
    rel_a = np.asarray(rw["rel_a"])
    rel_b = np.asarray(rw["rel_b"])
    assert not bool(rw["wide_overflow"])
    for r in range(B):
        if not bool(valid[r]):
            assert dest[r] == rw["bp"], "invalid rows must sink"
            continue
        d = dest[r]
        assert 0 <= d < rw["bp"]
        segs = wseg[d // sb]
        assert segs[0] >= 0, "live slice marked dead"
        for slot, rel in ((int(a[r]), int(rel_a[r])), (int(b[r]), int(rel_b[r]))):
            # The window-relative index must resolve to THIS slot (or a replica of it)
            # through the slice's segment layout.
            k = rel // wd.BLK
            layout_pos = segs[k] * 8 + (rel % wd.BLK)
            assert pos_slot[layout_pos] == slot, (r, slot, rel, segs)
    # Slices wholly past the used region are dead.
    assert wseg[-1, 0] == -1
