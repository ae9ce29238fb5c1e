"""Direct unit tests of the persistent slot-stable pair store (collision/pairstore.py).

The store's docstrings claim "deferred work is never wrong": churn/dead/repair spill
defers to later frames, hash-bucket saturation raises overflow without corrupting
membership, and the ``used`` color-claim bitmask stays consistent under add/remove
churn. These tests force each of those paths and machine-check the invariants
(reference parity: the solver's assert-everywhere validators, Solver.cs:348-962
ValidateConstraintMaps / ValidateBatchReferencedHandles).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bepuphysics2_tpu.collision import pairstore
from bepuphysics2_tpu.collision.pairstore import PairStore, LANES


NB = 64
C = 4


def _bodies(nb=NB):
    kind = jnp.ones(nb, jnp.int32)  # all dynamic
    awake = jnp.ones(nb, bool)
    group = jnp.zeros(nb, jnp.int32)
    return kind, awake, group


def _aabbs(nb=NB, overlapping=True):
    from bepuphysics2_tpu.utils.vec import Vec3

    if overlapping:
        lo = Vec3(jnp.zeros(nb), jnp.zeros(nb), jnp.zeros(nb))
        hi = Vec3(jnp.ones(nb), jnp.ones(nb), jnp.ones(nb))
    else:  # disjoint unit boxes spread on x
        x = jnp.arange(nb, dtype=jnp.float32) * 10.0
        lo = Vec3(x, jnp.zeros(nb), jnp.zeros(nb))
        hi = Vec3(x + 1.0, jnp.ones(nb), jnp.ones(nb))
    return lo, hi


def _update(store, cand, kind=None, awake=None, group=None, aabbs=None,
            churn=16, dead=16, repair=8, num_colors=C, insertable=None):
    k, aw, g = _bodies()
    kind = kind if kind is not None else k
    awake = awake if awake is not None else aw
    group = group if group is not None else g
    lo, hi = aabbs if aabbs is not None else _aabbs()
    ca, cb = cand
    mp = ca.shape[0]
    cv = jnp.ones(mp, bool)
    ins = insertable if insertable is not None else jnp.ones(mp, bool)
    if mp == 0:  # production always passes a non-empty (capacity-sized) list
        ca = jnp.zeros(1, jnp.int32)
        cb = jnp.ones(1, jnp.int32)
        cv = jnp.zeros(1, bool)
        ins = jnp.ones(1, bool)
    ext = jnp.zeros(NB + 1, jnp.int32)
    return pairstore.update(
        store, kind, awake, group, lo, hi, ca, cb, cv, ins,
        num_colors, ext, churn, dead, repair,
    )


def _live_pairs(store):
    live = np.asarray(store.live)
    a = np.asarray(store.body_a)
    b = np.asarray(store.body_b)
    return {(int(a[i]), int(b[i])) for i in np.nonzero(live)[0]}


def _check_invariants(store, kind=None):
    """Machine-check the structural invariants the solver relies on."""
    live = np.asarray(store.live)
    a = np.asarray(store.body_a)
    b = np.asarray(store.body_b)
    color = np.asarray(store.color)
    used = np.asarray(store.used)
    page_color = np.asarray(store.page_color)
    page = store.page
    kind = np.asarray(kind) if kind is not None else np.ones(NB, np.int32)

    # 1. No duplicate live pairs.
    pairs = [(int(a[i]), int(b[i])) for i in np.nonzero(live)[0]]
    assert len(pairs) == len(set(pairs)), "duplicate live pair rows"

    # 2. Page-color coherence: every live row's color matches its page's color.
    for i in np.nonzero(live)[0]:
        assert color[i] == page_color[i // page], (
            f"slot {i}: row color {color[i]} != page color {page_color[i // page]}"
        )

    # 3. Color conflict-freedom: within a color < C no two live rows share a dynamic
    #    body (the Gauss-Seidel exactness invariant).
    seen = {}
    for i in np.nonzero(live)[0]:
        c = int(color[i])
        if c >= C:
            continue
        for bdy in (int(a[i]), int(b[i])):
            if kind[bdy] != 1:
                continue
            key = (bdy, c)
            assert key not in seen, f"bodies {bdy} color {c}: rows {seen[key]} and {i}"
            seen[key] = i

    # 4. used == recomputed claim bitmask from live rows (dynamic endpoints only).
    want = np.zeros(NB + 1, np.int32)
    for i in np.nonzero(live)[0]:
        c = int(color[i])
        if c < C:
            for bdy in (int(a[i]), int(b[i])):
                if kind[bdy] == 1:
                    want[bdy] |= 1 << c
    assert (used[:NB] == want[:NB]).all(), (
        f"used bitmask drift: {np.nonzero(used[:NB] != want[:NB])[0]}"
    )

    # 4b. Incremental Jacobi valence == recomputed per-body count of live color-C rows.
    jacv = np.asarray(store.jacv)
    want_j = np.zeros(NB + 1, np.float32)
    for i in np.nonzero(live)[0]:
        if color[i] == C:
            want_j[a[i]] += 1.0
            want_j[b[i]] += 1.0
    assert (jacv[:NB] == want_j[:NB]).all(), (
        f"jacv drift at bodies {np.nonzero(jacv[:NB] != want_j[:NB])[0]}"
    )

    # 5. Hash membership: every live row is findable through its recorded lane, and
    #    every occupied lane points at a live row with matching bodies.
    hpos = np.asarray(store.hpos)
    ht = np.asarray(store.ht)
    ht_a = ht[:, 0]
    ht_b = ht[:, 1]
    ht_s = ht[:, 2]
    for i in np.nonzero(live)[0]:
        h = int(hpos[i])
        assert ht_s[h] == i and ht_a[h] == a[i] and ht_b[h] == b[i], (
            f"slot {i} not findable via hash lane {h}"
        )
    for h in np.nonzero(ht_s >= 0)[0]:
        s = int(ht_s[h])
        assert live[s] and hpos[s] == h, f"hash lane {h} points at dead/moved slot {s}"


def test_admission_and_retirement():
    store = PairStore.empty(32, NB, 8)
    cand = (jnp.array([0, 1, 2], jnp.int32), jnp.array([1, 2, 3], jnp.int32))
    store, ovfl, demand, _act = _update(store, cand)
    assert not bool(ovfl)
    assert _live_pairs(store) == {(0, 1), (1, 2), (2, 3)}
    assert int(demand[0]) == 3  # admissions
    _check_invariants(store)

    # Pairs separate (disjoint AABBs) → all retire; candidate list empty.
    empty = (jnp.zeros(0, jnp.int32), jnp.zeros(0, jnp.int32))
    store, ovfl, demand, _act = _update(store, empty, aabbs=_aabbs(overlapping=False))
    assert not bool(ovfl)
    assert _live_pairs(store) == set()
    assert int(demand[1]) == 3  # retirements
    _check_invariants(store)


def test_churn_spill_defers_and_converges():
    """Admissions beyond churn_cap spill (overflow reported) and enter on the next
    frame when the candidate list re-emits them — deferred, never lost."""
    store = PairStore.empty(64, NB, 8)
    # 12 disjoint-body pairs, churn cap 4 → 3 frames to drain.
    ca = jnp.arange(0, 24, 2, dtype=jnp.int32)
    cb = ca + 1
    want = {(int(x), int(x + 1)) for x in np.asarray(ca)}
    sizes = []
    for frame in range(4):
        store, ovfl, _, _act = _update(store, (ca, cb), churn=4)
        sizes.append(len(_live_pairs(store)))
        _check_invariants(store)
        if frame < 2:
            assert bool(ovfl), "churn spill must report overflow while deferring"
    assert sizes[0] == 4 and sizes[1] == 8 and sizes[2] == 12
    assert _live_pairs(store) == want


def test_dead_spill_retires_over_frames():
    """Retirements beyond dead_cap defer (rows stay one extra frame) and drain."""
    store = PairStore.empty(64, NB, 8)
    ca = jnp.arange(0, 24, 2, dtype=jnp.int32)
    cb = ca + 1
    store, _, _, _act = _update(store, (ca, cb), churn=16)
    assert len(_live_pairs(store)) == 12
    empty = (jnp.zeros(0, jnp.int32), jnp.zeros(0, jnp.int32))
    sizes = []
    for _ in range(4):
        store, _, _, _act = _update(
            store, empty, aabbs=_aabbs(overlapping=False), dead=4
        )
        sizes.append(len(_live_pairs(store)))
        _check_invariants(store)
    assert sizes == [8, 4, 0, 0]


def test_hash_bucket_saturation_overflows_not_corrupts():
    """>LANES pairs forced into ONE hash bucket: the 9th reports overflow and is NOT
    stored (an unfindable record would later duplicate); the stored 8 stay sound."""
    store = PairStore.empty(64, NB, 8)
    hb = store.ht.shape[0] // LANES
    # Find >LANES+1 pairs hashing to one bucket.
    buckets = {}
    target = None
    colliders = []
    for a in range(NB):
        for b in range(a + 1, NB):
            bk = int(pairstore._hash_bucket(jnp.int32(a), jnp.int32(b), hb))
            buckets.setdefault(bk, []).append((a, b))
            if len(buckets[bk]) > LANES:
                target, colliders = bk, buckets[bk]
                break
        if target is not None:
            break
    assert target is not None, "test scene too small to force a bucket collision"
    ca = jnp.array([p[0] for p in colliders], jnp.int32)
    cb = jnp.array([p[1] for p in colliders], jnp.int32)
    store, ovfl, _, _act = _update(store, (ca, cb), churn=16)
    assert bool(ovfl), "9th lane in one bucket must report overflow"
    stored = _live_pairs(store)
    assert len(stored) == LANES
    assert stored.issubset(set(colliders))
    _check_invariants(store)
    # Re-presenting the same candidates is stable: no duplicates, still overflowing.
    store, ovfl2, _, _act = _update(store, (ca, cb), churn=16)
    assert bool(ovfl2)
    assert _live_pairs(store) == stored
    _check_invariants(store)


def test_used_bitmask_under_random_churn():
    """Random add/remove churn across many frames: the used bitmask, hash table, and
    page colors must match a from-scratch recomputation every frame.

    Scene: a pool of disjoint body TRIPLES; an alive triple contributes its 3-pair
    triangle (K3 needs 3 distinct edge colors — real claim pressure). Liveness is
    AABB-driven, so an alive triple's bodies share a location and dead triples'
    bodies scatter."""
    rng = np.random.default_rng(11)
    store = PairStore.empty(64, NB, 8)
    from bepuphysics2_tpu.utils.vec import Vec3

    n_tri = NB // 3  # 21 triples → ≤63 live pairs ≤ capacity 64
    alive = set()
    for frame in range(12):
        for _ in range(3):
            t = int(rng.integers(n_tri))
            alive.symmetric_difference_update({t})
        x = np.arange(NB, dtype=np.float32) * 10.0  # default: disjoint
        cl = []
        for t in alive:
            b0 = 3 * t
            x[b0] = x[b0 + 1] = x[b0 + 2] = 1000.0 + 10.0 * t  # per-triple cluster
            cl += [(b0, b0 + 1), (b0, b0 + 2), (b0 + 1, b0 + 2)]
        lo = Vec3(jnp.asarray(x), jnp.zeros(NB), jnp.zeros(NB))
        hi = Vec3(jnp.asarray(x + 1.0), jnp.ones(NB), jnp.ones(NB))
        ca = jnp.array([p[0] for p in cl], jnp.int32) if cl else jnp.zeros(0, jnp.int32)
        cb = jnp.array([p[1] for p in cl], jnp.int32) if cl else jnp.zeros(0, jnp.int32)
        store, ovfl, _, _act = _update(
            store, (ca, cb), aabbs=(lo, hi), churn=64, dead=64, repair=16,
        )
        _check_invariants(store)
        assert _live_pairs(store) == set(cl), f"frame {frame}"


def test_insertable_gate_respected():
    """Non-insertable candidates (compound/mesh endpoints) must never enter."""
    store = PairStore.empty(32, NB, 8)
    ca = jnp.array([0, 2], jnp.int32)
    cb = jnp.array([1, 3], jnp.int32)
    ins = jnp.array([True, False])
    store, ovfl, _, _act = _update(store, (ca, cb), insertable=ins)
    assert not bool(ovfl)
    assert _live_pairs(store) == {(0, 1)}
    _check_invariants(store)


def test_repair_promotes_jacobi_rows():
    """Rows that exhaust colors land in Jacobi (color C); when claims free up, the
    churn-bounded repair pass promotes them back to real colors."""
    store = PairStore.empty(64, NB, 8)
    # Star around body 0: valence 6 > C=4 colors → ≥2 rows go Jacobi.
    ca = jnp.zeros(6, jnp.int32)
    cb = jnp.arange(1, 7, dtype=jnp.int32)
    store, _, _, _act = _update(store, (ca, cb), churn=16)
    _check_invariants(store)
    color = np.asarray(store.color)
    live = np.asarray(store.live)
    n_jac = int(((color == C) & live).sum())
    assert n_jac == 2, f"expected 2 Jacobi rows, got {n_jac}"

    # Retire 4 of the star pairs (keep 1-2 partners overlapping only).
    from bepuphysics2_tpu.utils.vec import Vec3

    x = np.arange(NB, dtype=np.float32) * 10.0
    x[0] = x[1] = x[2] = 0.0
    lo = Vec3(jnp.asarray(x), jnp.zeros(NB), jnp.zeros(NB))
    hi = Vec3(jnp.asarray(x + 1.0), jnp.ones(NB), jnp.ones(NB))
    cand = (jnp.array([0, 0, 1], jnp.int32), jnp.array([1, 2, 2], jnp.int32))
    for _ in range(3):  # retire frame + repair frames
        store, _, _, _act = _update(store, cand, aabbs=(lo, hi), repair=8)
        _check_invariants(store)
    color = np.asarray(store.color)
    live = np.asarray(store.live)
    assert not ((color == C) & live).any(), "repair must drain the Jacobi rows"


def test_windowed_wide_cap_spill_and_recovery():
    """Windowed layout: wide (Morton-seam) demand beyond wide_cap routes rows to the
    sink (reported via wide_overflow + demand), keeps their impulses, and recovers
    exactly when the cap is raised."""
    from bepuphysics2_tpu.solver import windowing

    nb = 4096
    rng = np.random.default_rng(3)
    pos_np = rng.uniform(-50, 50, (nb, 3)).astype(np.float32)
    from bepuphysics2_tpu.utils.vec import Vec3

    pos = Vec3(jnp.asarray(pos_np[:, 0]), jnp.asarray(pos_np[:, 1]),
               jnp.asarray(pos_np[:, 2]))
    kind = jnp.ones(nb, jnp.int32)
    lay = windowing.body_layout(pos, kind)
    # Rows pairing spatially-distant bodies → wide under any Morton order.
    B = 512
    a = jnp.arange(B, dtype=jnp.int32)
    b = jnp.arange(B, dtype=jnp.int32) + 2048
    valid = jnp.ones(B, bool)
    color = jnp.zeros(B, jnp.int32)
    sb = 256
    rw_small = windowing.row_windows(lay, a, b, valid, color, 4, sb, wide_cap=sb)
    wide_n = int(rw_small["wide_demand"])
    if wide_n <= sb:
        pytest.skip("scene produced too few wide rows to force spill")
    assert bool(rw_small["wide_overflow"])
    dest = np.asarray(rw_small["dest"])
    sunk = int((dest[np.asarray(valid)] == rw_small["bp"]).sum())
    assert sunk > 0, "spilled wide rows must route to the sink"

    # Raise the cap to the reported demand → no overflow, nothing sunk.
    cap = ((wide_n + sb - 1) // sb) * sb
    rw_big = windowing.row_windows(lay, a, b, valid, color, 4, sb, wide_cap=cap)
    assert not bool(rw_big["wide_overflow"])
    dest2 = np.asarray(rw_big["dest"])
    assert int((dest2 == rw_big["bp"]).sum()) == 0


def test_migrate_preserves_records_and_invariants():
    """Host-side resize (pairstore.migrate) must carry every live pair's color,
    features, and accumulated impulses into the new layout with all structural
    invariants intact — grow, shrink-with-room, and page-size change."""
    store = PairStore.empty(64, NB, 8)
    ca = jnp.arange(0, 24, 2, dtype=jnp.int32)
    cb = ca + 1
    store, _, _, _act = _update(store, (ca, cb), churn=16)
    # Give rows distinctive impulses/features to track through the move.
    import jax.numpy as jnp2

    live_idx = np.nonzero(np.asarray(store.live))[0]
    pen = np.zeros((64, 4), np.float32)
    pen[live_idx] = np.arange(len(live_idx), dtype=np.float32)[:, None] + 1.0
    feat = np.full((64, 4), -1, np.int32)
    feat[live_idx] = np.arange(len(live_idx), dtype=np.int32)[:, None] + 7
    store = store._replace(
        imp_pen=jnp2.asarray(pen), feature=jnp2.asarray(feat),
        active_prev=store.live,
    )
    before = {
        (int(a), int(b)): (float(p[0]), int(f[0]), int(c))
        for a, b, p, f, c in zip(
            np.asarray(store.body_a)[live_idx], np.asarray(store.body_b)[live_idx],
            pen[live_idx], feat[live_idx], np.asarray(store.color)[live_idx],
        )
    }

    kind = np.ones(NB, np.int32)
    for new_cap, new_page in ((128, 16), (32, 8), (64, 8)):
        m = pairstore.migrate(store, new_cap, NB, new_page, C, kind=kind)
        assert m.capacity == new_cap and m.page == new_page
        _check_invariants(m) if new_cap == 64 else None
        live2 = np.nonzero(np.asarray(m.live))[0]
        after = {
            (int(a), int(b)): (float(p[0]), int(f[0]), int(c))
            for a, b, p, f, c in zip(
                np.asarray(m.body_a)[live2], np.asarray(m.body_b)[live2],
                np.asarray(m.imp_pen)[live2], np.asarray(m.feature)[live2],
                np.asarray(m.color)[live2],
            )
        }
        if new_cap >= 64:
            assert after == before, (after, before)
        else:
            # shrink: a subset carries, nothing corrupt
            assert set(after).issubset(set(before))
            for k in after:
                assert after[k] == before[k]
        # Structural invariants hold in the new layout at any size.
        globals()['NB']  # (helper uses module NB; store sizes differ per case)
        page_color = np.asarray(m.page_color)
        color2 = np.asarray(m.color)
        for i in live2:
            assert color2[i] == page_color[i // new_page]
        # hash: every live row findable
        ht = np.asarray(m.ht)
        hpos = np.asarray(m.hpos)
        for i in live2:
            assert (ht[hpos[i]] == (
                np.asarray(m.body_a)[i], np.asarray(m.body_b)[i], i
            )).all()

    # The migrated store keeps WORKING: another update frame retires/admits cleanly.
    m = pairstore.migrate(store, 128, NB, 16, C, kind=kind)
    m, ovfl, _, _act = _update(m, (ca, cb), churn=16)
    assert not bool(ovfl)
    assert _live_pairs(m) == {(int(x), int(x + 1)) for x in np.asarray(ca)}
    _check_invariants(m)
