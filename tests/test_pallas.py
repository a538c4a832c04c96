"""Golden tests: Pallas kernels vs the jnp plane-math they share
(interpret mode on CPU; the real compile is exercised by bench.py on
TPU). This systematizes the reference's DATA_DUMP FPGA-vs-software
equivalence checks (core.cpp:512-563)."""

import jax.numpy as jnp
import numpy as np

from slam_tpu.models import rbpf
from slam_tpu.models.particles import init_particles
from slam_tpu.ops import planes as pk
from slam_tpu.ops.pallas.kernels import (
    _observe_call,
    fs1_observe_tpu,
    jacobians_tpu,
)

R = np.diag([0.01, 0.0003]).astype(np.float32)


def _planes_inputs(P=300, K=5, seed=0):
    rng = np.random.default_rng(seed)
    xv = rng.normal(size=(3, P)).astype(np.float32)
    lmx = (xv[0] + rng.normal(size=(K, P)) * 5 + 2).astype(np.float32)
    lmy = (xv[1] + rng.normal(size=(K, P)) * 5 + 1).astype(np.float32)
    A = rng.normal(size=(K, P)).astype(np.float32) * 0.3
    B = rng.normal(size=(K, P)).astype(np.float32) * 0.3
    p00 = A * A + 0.05
    p11 = B * B + 0.05
    p01 = 0.3 * A * B
    return xv, lmx, lmy, p00, p01, p11


def test_jacobians_kernel_matches_planes():
    xv, lmx, lmy, p00, p01, p11 = _planes_inputs()
    got = jacobians_tpu(*map(jnp.asarray, (xv, lmx, lmy, p00, p01, p11)),
                        jnp.asarray(R), interpret=True)
    want = pk.jacobians_planes(xv[0][None], xv[1][None], xv[2][None],
                               lmx, lmy, p00, p01, p11,
                               R[0, 0], R[0, 1], R[1, 1])
    for name, g, w in zip(got._fields, got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-6, err_msg=name)


def test_observe_kernel_matches_unfused():
    xv, lmx, lmy, p00, p01, p11 = _planes_inputs(P=260, K=4, seed=3)
    K = 4
    z = np.abs(np.random.default_rng(1).normal(size=(K, 2))
               ).astype(np.float32) + np.array([4.0, 0.0], np.float32)
    matched = np.array([True, False, True, True])

    outs = _observe_call(*map(jnp.asarray,
                              (xv, lmx, lmy, p00, p01, p11, z, matched)),
                         jnp.asarray(R), interpret=True)
    dlogw, nx, ny, np00, np01, np11 = map(np.asarray, outs)

    # Unfused reference using the same plane math.
    J = pk.jacobians_planes(xv[0][None], xv[1][None], xv[2][None],
                            lmx, lmy, p00, p01, p11,
                            R[0, 0], R[0, 1], R[1, 1])
    v0 = z[:, 0][:, None] - np.asarray(J.zr)
    from slam_tpu.geometry import wrap_angle
    v1 = np.asarray(wrap_angle(z[:, 1][:, None] - J.zb))
    logl = np.asarray(pk.log_gauss2_planes(
        jnp.asarray(v0), jnp.asarray(v1), J.s00, J.s01, J.s11))
    want_dlogw = (logl * matched[:, None]).sum(0)
    np.testing.assert_allclose(dlogw[0], want_dlogw, rtol=1e-4,
                               atol=1e-5)

    upd = pk.feature_update_planes(jnp.asarray(lmx), jnp.asarray(lmy),
                                   jnp.asarray(p00), jnp.asarray(p01),
                                   jnp.asarray(p11), jnp.asarray(v0),
                                   jnp.asarray(v1), J)
    for k in range(K):
        if matched[k]:
            np.testing.assert_allclose(nx[k], np.asarray(upd.nx)[k],
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np11[k], np.asarray(upd.np11)[k],
                                       rtol=1e-3, atol=1e-5)
        else:  # pass-through
            np.testing.assert_allclose(nx[k], lmx[k])
            np.testing.assert_allclose(np00[k], p00[k])


def test_fs1_observe_tpu_matches_jnp_update():
    """The full fused-state path == the unfused fs1 weight+feature
    update (same ParticleState in, same out)."""
    from slam_tpu.ops.planes import log_gauss2_planes
    P, L = 200, 6
    rng = np.random.default_rng(7)
    state = init_particles(P, L, L)
    lm = rng.normal(size=(2, L, P)).astype(np.float32) * 5
    lm_P = np.zeros((3, L, P), np.float32)
    lm_P[0] = 0.1
    lm_P[2] = 0.1
    state = state._replace(
        xv=jnp.asarray(rng.normal(size=(3, P)).astype(np.float32) * 0.1),
        lm=jnp.asarray(lm), lm_P=jnp.asarray(lm_P), n=jnp.int32(L))

    z = jnp.asarray(np.array([[5.0, 0.3], [4.0, -0.2]], np.float32))
    slot = jnp.array([2, 4], dtype=jnp.int32)
    matched = jnp.array([True, True])

    got = fs1_observe_tpu(state, z, slot, matched, jnp.asarray(R),
                          interpret=True)

    J, v0, v1 = rbpf.observe_planes(state, z, slot, jnp.asarray(R))
    logl = jnp.where(matched[:, None],
                     log_gauss2_planes(v0, v1, J.s00, J.s01, J.s11), 0.0)
    want = state._replace(logw=state.logw + jnp.sum(logl, axis=0))
    want = rbpf.update_matched_features(want, slot, matched, v0, v1, J)

    np.testing.assert_allclose(np.asarray(got.logw),
                               np.asarray(want.logw), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.lm), np.asarray(want.lm),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.lm_P),
                               np.asarray(want.lm_P), rtol=1e-3,
                               atol=1e-5)


def test_fs1_fused_update_matches_unfused_sequence():
    """Kernel 4 (single-pass gather+weight+EKF+init+scatter, aliased)
    == the unfused chain observe_planes -> update_matched_features ->
    add_new_features on the same state, including mixed matched/new/
    invalid observations."""
    from slam_tpu.ops.pallas.kernels import fs1_update_tpu
    from slam_tpu.ops.planes import log_gauss2_planes
    P, L = 256, 8
    rng = np.random.default_rng(11)
    state = init_particles(P, L, 12)
    lm = rng.normal(size=(2, L, P)).astype(np.float32) * 5
    lm_P = np.zeros((3, L, P), np.float32)
    lm_P[0] = 0.1
    lm_P[2] = 0.1
    table = -np.ones(12, np.int32)
    table[[3, 7, 9]] = [0, 1, 2]
    state = state._replace(
        xv=jnp.asarray(rng.normal(size=(3, P)).astype(np.float32) * 0.1),
        lm=jnp.asarray(lm), lm_P=jnp.asarray(lm_P), n=jnp.int32(3),
        da_table=jnp.asarray(table))

    # Obs 0: matched slot 0; obs 1: NEW id 5; obs 2: invalid (masked);
    # obs 3: matched slot 2.
    z = jnp.asarray(np.array([[5.0, 0.3], [4.0, -0.2], [3.0, 0.1],
                              [6.0, -0.4]], np.float32))
    ids = jnp.asarray(np.array([3, 5, 4, 9], np.int32))
    zmask = jnp.asarray(np.array([True, True, False, True]))

    assoc, is_new = rbpf.associate_known(state, ids, zmask)
    matched = assoc >= 0
    slot = jnp.where(matched, assoc, 0)
    offset = (jnp.cumsum(is_new.astype(jnp.int32))
              - is_new.astype(jnp.int32))
    slot_new = state.n + offset
    ok = is_new & (slot_new < L)

    got = fs1_update_tpu(state, z, slot, matched, slot_new, ok,
                         jnp.asarray(R), interpret=True)

    J, v0, v1 = rbpf.observe_planes(state, z, slot, jnp.asarray(R))
    logl = jnp.where(matched[:, None],
                     log_gauss2_planes(v0, v1, J.s00, J.s01, J.s11), 0.0)
    want = state._replace(logw=state.logw + jnp.sum(logl, axis=0))
    want = rbpf.update_matched_features(want, slot, matched, v0, v1, J)
    want = rbpf.add_new_features(want, z, ids, is_new, jnp.asarray(R))

    np.testing.assert_allclose(np.asarray(got.logw),
                               np.asarray(want.logw), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.lm), np.asarray(want.lm),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.lm_P),
                               np.asarray(want.lm_P), rtol=1e-3,
                               atol=1e-5)


def test_fs1_fused_update_segmented_matches_unsegmented():
    """The landmark-SEGMENTED fused update (grid over landmark row
    groups — the full-10k-capacity path) == the single-segment kernel
    == the unfused chain, with matched/new observations spanning
    several segments."""
    from slam_tpu.ops.pallas.kernels import _fused_tiling, fs1_update_tpu
    from slam_tpu.ops.planes import log_gauss2_planes
    P, L = 256, 16
    rng = np.random.default_rng(23)
    state = init_particles(P, L, 24)
    lm = rng.normal(size=(2, L, P)).astype(np.float32) * 5
    lm_P = np.zeros((3, L, P), np.float32)
    lm_P[0] = 0.1
    lm_P[2] = 0.1
    # Live slots 0..9 spread over id table; obs hit slots in segments
    # 0, 1 and 2 (Lseg = 4), plus new features landing in segments 2/3.
    table = -np.ones(24, np.int32)
    table[2:12] = np.arange(10)
    state = state._replace(
        xv=jnp.asarray(rng.normal(size=(3, P)).astype(np.float32) * 0.1),
        lm=jnp.asarray(lm), lm_P=jnp.asarray(lm_P), n=jnp.int32(10),
        da_table=jnp.asarray(table))

    K = 6
    z = jnp.asarray(np.column_stack(
        [rng.uniform(3, 8, K), rng.uniform(-0.5, 0.5, K)]
    ).astype(np.float32))
    # ids: slots 1 (seg 0), 6 (seg 1), 9 (seg 2), NEW id 15 -> slot 10
    # (seg 2), NEW id 20 -> slot 11 (seg 2), invalid.
    ids = jnp.asarray(np.array([3, 8, 11, 15, 20, 4], np.int32))
    zmask = jnp.asarray(np.array([True, True, True, True, True, False]))

    assoc, is_new = rbpf.associate_known(state, ids, zmask)
    matched = assoc >= 0
    slot = jnp.where(matched, assoc, 0)
    offset = (jnp.cumsum(is_new.astype(jnp.int32))
              - is_new.astype(jnp.int32))
    slot_new = state.n + offset
    ok = is_new & (slot_new < L)

    assert _fused_tiling(P, L, K) is not None

    got_seg = fs1_update_tpu(state, z, slot, matched, slot_new, ok,
                             jnp.asarray(R), interpret=True,
                             tiling=(128, 4))
    got_one = fs1_update_tpu(state, z, slot, matched, slot_new, ok,
                             jnp.asarray(R), interpret=True,
                             tiling=(256, L))

    J, v0, v1 = rbpf.observe_planes(state, z, slot, jnp.asarray(R))
    logl = jnp.where(matched[:, None],
                     log_gauss2_planes(v0, v1, J.s00, J.s01, J.s11), 0.0)
    want = state._replace(logw=state.logw + jnp.sum(logl, axis=0))
    want = rbpf.update_matched_features(want, slot, matched, v0, v1, J)
    want = rbpf.add_new_features(want, z, ids, is_new, jnp.asarray(R))

    for got, tag in ((got_seg, "segmented"), (got_one, "single")):
        np.testing.assert_allclose(np.asarray(got.logw),
                                   np.asarray(want.logw), rtol=1e-4,
                                   atol=1e-5, err_msg=tag)
        np.testing.assert_allclose(np.asarray(got.lm),
                                   np.asarray(want.lm), rtol=1e-4,
                                   atol=1e-5, err_msg=tag)
        np.testing.assert_allclose(np.asarray(got.lm_P),
                                   np.asarray(want.lm_P), rtol=1e-3,
                                   atol=1e-5, err_msg=tag)


def test_fs2_refine_kernel_matches_jnp():
    """Fused FS2 proposal refinement == the sequential jnp fori_loop
    (_refine_proposal), including unmatched-slot pass-through."""
    from slam_tpu.models.fastslam2 import _refine_proposal
    from slam_tpu.ops.pallas.kernels import fs2_refine_tpu
    P, L, K = 220, 8, 5
    rng = np.random.default_rng(11)
    state = init_particles(P, L, L)
    lm = rng.normal(size=(2, L, P)).astype(np.float32) * 5
    lm_P = np.zeros((3, L, P), np.float32)
    lm_P[0] = 0.1
    lm_P[2] = 0.1
    Pv = np.zeros((6, P), np.float32)
    Pv[0] = 0.02
    Pv[3] = 0.02
    Pv[5] = 0.01
    state = state._replace(
        xv=jnp.asarray(rng.normal(size=(3, P)).astype(np.float32) * 0.1),
        Pv=jnp.asarray(Pv),
        lm=jnp.asarray(lm), lm_P=jnp.asarray(lm_P), n=jnp.int32(L))

    z = jnp.asarray(
        np.column_stack([rng.uniform(3, 8, K),
                         rng.uniform(-0.5, 0.5, K)]).astype(np.float32))
    slot = jnp.asarray(np.array([1, 3, 0, 6, 2], np.int32))
    matched = jnp.asarray(np.array([True, False, True, True, False]))

    gathered = rbpf.gather_landmarks(state, slot)
    got_xv, got_Pv = fs2_refine_tpu(state.xv, state.Pv, *gathered,
                                    z, matched, jnp.asarray(R),
                                    interpret=True)
    want_xv, want_Pv = _refine_proposal(state, z, matched, gathered,
                                        jnp.asarray(R))
    np.testing.assert_allclose(np.asarray(got_xv), np.asarray(want_xv),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_Pv), np.asarray(want_Pv),
                               rtol=1e-3, atol=1e-6)


def test_plane_jacobians_match_stacked():
    """Plane-form jacobians == the stacked-matrix compute_jacobians used
    by the EKF path."""
    from slam_tpu.ops.jacobians import compute_jacobians
    xv, lmx, lmy, p00, p01, p11 = _planes_inputs(P=40, K=3, seed=9)
    J = pk.jacobians_planes(xv[0][None], xv[1][None], xv[2][None],
                            lmx, lmy, p00, p01, p11,
                            R[0, 0], R[0, 1], R[1, 1])
    for k in range(3):
        for i in range(40):
            Pf = np.array([[p00[k, i], p01[k, i]],
                           [p01[k, i], p11[k, i]]], np.float32)
            zp, Hv, Hf, Sf = compute_jacobians(
                jnp.asarray(xv[:, i]),
                jnp.asarray(np.array([lmx[k, i], lmy[k, i]], np.float32)),
                jnp.asarray(Pf), jnp.asarray(R))
            np.testing.assert_allclose(float(J.zr[k, i]), float(zp[0]),
                                       rtol=1e-5)
            np.testing.assert_allclose(float(J.a[k, i]), float(Hf[0, 0]),
                                       rtol=1e-4, atol=1e-6)
            np.testing.assert_allclose(float(J.hv10[k, i]),
                                       float(Hv[1, 0]), rtol=1e-4,
                                       atol=1e-6)
            np.testing.assert_allclose(float(J.s00[k, i]),
                                       float(Sf[0, 0]), rtol=1e-3,
                                       atol=1e-6)
            np.testing.assert_allclose(float(J.s01[k, i]),
                                       float(Sf[0, 1]), rtol=1e-3,
                                       atol=1e-6)


def test_sorted_gather_exact():
    """Resampling ancestor gather kernel == XLA gather, bit-exact, for
    sorted, collapsed, and unsorted indices (unsorted is the slow path
    but must stay correct)."""
    from slam_tpu.ops.pallas.gather import sorted_gather
    rng = np.random.default_rng(5)
    C, P = 21, 1700
    flat = jnp.asarray(rng.normal(size=(C, P)).astype(np.float32) * 37)
    cases = [
        np.sort(rng.integers(0, P, P)),          # stratified-like
        np.zeros(P),                              # full collapse
        rng.integers(0, P, P),                    # unsorted
        np.sort(rng.integers(0, P, P // 3)),      # n_out != P
    ]
    for raw in cases:
        idx = jnp.asarray(raw.astype(np.int32))
        got = sorted_gather(flat, idx, interpret=True)
        want = flat[:, idx]
        assert got.shape == want.shape
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
