"""Pallas TPU kernels: batched Jacobians and the fused FastSLAM
observation update.

TPU-native replacement for the reference's Vivado-HLS ``computeJacobians``
accelerator (core.cpp:586-664, driven through AcceleratorHandler's mmap'd
OCM): instead of marshalling floats into on-chip memory and busy-waiting
on a start/done register, the particle planes already live in HBM in
kernel layout ([K, P] with particles on lanes — slam_tpu.models.particles)
and the kernel bodies call the *same* plane-math functions as the jnp path
(slam_tpu.ops.planes), so golden equivalence is structural.

The fused kernel (``fs1_observe_tpu``) computes, per particle x matched
observation: Jacobians -> innovation -> Gaussian log-likelihood reduction
-> per-landmark 2x2 EKF update, entirely VMEM-resident. Unfused, the
chain would round-trip ~15 [K, P] intermediate planes through HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slam_tpu.geometry import wrap_angle
from slam_tpu.ops import planes as pk

LANE = 128
DEFAULT_BLOCK = None  # auto (VMEM-aware)
# The kernels' live working set is ~42 [K, B] f32 plane-equivalents
# (measured 18.8 MB at block=8064, K=14) including Mosaic's
# double-buffered grid I/O. A v5e core has 128 MB of VMEM but Mosaic's
# default budget is 16 MB, which capped blocks at 2048; we size blocks
# against a 24 MB budget and raise the compiler limit accordingly
# (live-validated at block 4096/8192 on a v5e, round 3).
_VMEM_BUDGET_BYTES = 24 * 1024 * 1024
_VMEM_LIMIT_BYTES = 64 * 1024 * 1024
_LIVE_PLANES = 42


def _compiler_params():
    from jax.experimental.pallas import tpu as _pltpu
    return _pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES)


def _auto_block(K: int) -> int:
    """Largest lane-block that keeps the kernel's working set within the
    VMEM budget — fewer grid programs means less per-program overhead at
    large particle counts."""
    b = _VMEM_BUDGET_BYTES // (_LIVE_PLANES * max(K, 1) * 4)
    b = min(8192, max(LANE, (b // LANE) * LANE))
    return int(b)


def _pad_lanes(x, P_pad):
    pad = P_pad - x.shape[-1]
    if pad == 0:
        return x
    width = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, width)


def _grid_block(P_pad, block):
    b = min(block, P_pad)
    return P_pad // b, b


# ---------------------------------------------------------------------------
# Kernel 1: standalone batched computeJacobians
# ---------------------------------------------------------------------------

def _jacobian_kernel(xv_ref, lmx_ref, lmy_ref, p00_ref, p01_ref,
                     p11_ref, r_ref,
                     zr_ref, zb_ref, hv00_ref, hv01_ref, hv10_ref,
                     hv11_ref, a_ref, b_ref, c_ref, e_ref,
                     s00_ref, s01_ref, s11_ref):
    J = pk.jacobians_planes(
        xv_ref[0:1, :], xv_ref[1:2, :], xv_ref[2:3, :],
        lmx_ref[:, :], lmy_ref[:, :],
        p00_ref[:, :], p01_ref[:, :], p11_ref[:, :],
        r_ref[0, 0], r_ref[0, 1], r_ref[0, 2])
    zr_ref[:, :] = J.zr
    zb_ref[:, :] = J.zb
    hv00_ref[:, :] = J.hv00
    hv01_ref[:, :] = J.hv01
    hv10_ref[:, :] = J.hv10
    hv11_ref[:, :] = J.hv11
    a_ref[:, :] = J.a
    b_ref[:, :] = J.b
    c_ref[:, :] = J.c
    e_ref[:, :] = J.e
    s00_ref[:, :] = J.s00
    s01_ref[:, :] = J.s01
    s11_ref[:, :] = J.s11


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def jacobians_tpu(xv, lmx, lmy, p00, p01, p11, R,
                  block: int | None = DEFAULT_BLOCK,
                  interpret: bool = False):
    """Batched range-bearing Jacobians + innovation covariance.

    Args: xv [3, P]; lmx/lmy/p00/p01/p11 [K, P] gathered landmark planes;
    R [2, 2]. Returns a JacobianPlanes of [K, P] planes — the TPU analog
    of the FPGA accelerator's zp/Hf/Hv/Sf output block (core.cpp:624-664).
    """
    K, P = lmx.shape
    block = block or _auto_block(K)
    # Pad P up to a whole number of blocks (block is LANE-aligned), but
    # never beyond one LANE-aligned block for small P.
    if P <= block:
        block = -(-P // LANE) * LANE
    P_pad = -(-P // block) * block
    args = [_pad_lanes(x, P_pad) for x in (xv, lmx, lmy, p00, p01, p11)]
    r_row = jnp.asarray([R[0, 0], R[0, 1], R[1, 1]],
                        xv.dtype).reshape(1, 3)

    grid, b = _grid_block(P_pad, block)
    plane = pl.BlockSpec((K, b), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((K, P_pad), xv.dtype)] * 13
    outs = pl.pallas_call(
        _jacobian_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((3, b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            plane, plane, plane, plane, plane,
            pl.BlockSpec((1, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[plane] * 13,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(*args, r_row)
    return pk.JacobianPlanes(*[o[:, :P] for o in outs])


# ---------------------------------------------------------------------------
# Kernel 2: fused observe (Jacobians + log-likelihood + 2x2 EKF update)
# ---------------------------------------------------------------------------

def _observe_kernel(xv_ref, lmx_ref, lmy_ref, p00_ref, p01_ref, p11_ref,
                    z0_ref, z1_ref, mask_ref, r_ref,
                    dlogw_ref, nx_ref, ny_ref, np00_ref, np01_ref,
                    np11_ref):
    lmx, lmy = lmx_ref[:, :], lmy_ref[:, :]
    p00, p01, p11 = p00_ref[:, :], p01_ref[:, :], p11_ref[:, :]
    J = pk.jacobians_planes(
        xv_ref[0:1, :], xv_ref[1:2, :], xv_ref[2:3, :],
        lmx, lmy, p00, p01, p11,
        r_ref[0, 0], r_ref[0, 1], r_ref[0, 2])
    # z/mask blocks are [K, LANE]; only column 0 carries data — slice to
    # [K, 1] so they broadcast against the [K, block] planes.
    v0 = z0_ref[:, 0:1] - J.zr
    v1 = wrap_angle(z1_ref[:, 0:1] - J.zb)
    mask = mask_ref[:, 0:1]

    logl = pk.log_gauss2_planes(v0, v1, J.s00, J.s01, J.s11)
    dlogw_ref[:, :] = jnp.sum(logl * mask, axis=0, keepdims=True)

    upd = pk.feature_update_planes(lmx, lmy, p00, p01, p11, v0, v1, J)
    nx_ref[:, :] = jnp.where(mask > 0, upd.nx, lmx)
    ny_ref[:, :] = jnp.where(mask > 0, upd.ny, lmy)
    np00_ref[:, :] = jnp.where(mask > 0, upd.np00, p00)
    np01_ref[:, :] = jnp.where(mask > 0, upd.np01, p01)
    np11_ref[:, :] = jnp.where(mask > 0, upd.np11, p11)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _observe_call(xv, lmx, lmy, p00, p01, p11, z, matched, R,
                  block: int | None = DEFAULT_BLOCK,
                  interpret: bool = False):
    K, P = lmx.shape
    block = block or _auto_block(K)
    if P <= block:
        block = -(-P // LANE) * LANE
    P_pad = -(-P // block) * block
    args = [_pad_lanes(x, P_pad) for x in (xv, lmx, lmy, p00, p01, p11)]
    z0 = jnp.broadcast_to(z[:, 0:1], (K, LANE)).astype(xv.dtype)
    z1 = jnp.broadcast_to(z[:, 1:2], (K, LANE)).astype(xv.dtype)
    mk = jnp.broadcast_to(matched[:, None].astype(xv.dtype), (K, LANE))
    r_row = jnp.asarray([R[0, 0], R[0, 1], R[1, 1]],
                        xv.dtype).reshape(1, 3)

    grid, b = _grid_block(P_pad, block)
    plane = pl.BlockSpec((K, b), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    kplane = pl.BlockSpec((K, LANE), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _observe_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((3, b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            plane, plane, plane, plane, plane,
            kplane, kplane, kplane,
            pl.BlockSpec((1, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[pl.BlockSpec((1, b), lambda i: (0, i),
                                memory_space=pltpu.VMEM)]
        + [plane] * 5,
        out_shape=[jax.ShapeDtypeStruct((1, P_pad), xv.dtype)]
        + [jax.ShapeDtypeStruct((K, P_pad), xv.dtype)] * 5,
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(*args, z0, z1, mk, r_row)
    return [o[..., :P] for o in outs]


# ---------------------------------------------------------------------------
# Kernel 3: fused FastSLAM2 proposal refinement
# ---------------------------------------------------------------------------

def _refine_kernel(xv_ref, pv_ref, lmx_ref, lmy_ref, p00_ref, p01_ref,
                   p11_ref, zm_ref, r_ref, xvr_ref, pvr_ref):
    """Sequential per-feature Gaussian proposal refinement
    (sampleProposal, fastslam2.cpp:321-357), fully VMEM-resident: the
    K-step pose re-linearization chain runs on registers/VMEM instead of
    round-tripping K x (xv, Pv, Jacobian) planes through HBM. K is small
    and static, so the loop is unrolled."""
    K = lmx_ref.shape[0]
    xv = (xv_ref[0:1, :], xv_ref[1:2, :], xv_ref[2:3, :])
    Pv = tuple(pv_ref[i:i + 1, :] for i in range(6))
    r00, r01, r11 = r_ref[0, 0], r_ref[0, 1], r_ref[0, 2]
    for k in range(K):
        J = pk.jacobians_planes(
            xv[0], xv[1], xv[2],
            lmx_ref[k:k + 1, :], lmy_ref[k:k + 1, :],
            p00_ref[k:k + 1, :], p01_ref[k:k + 1, :],
            p11_ref[k:k + 1, :], r00, r01, r11)
        v0 = zm_ref[k, 0] - J.zr
        v1 = wrap_angle(zm_ref[k, 1] - J.zb)

        (dx0, dx1, dx2), Pv_new = pk.refine_pose_planes(J, Pv, v0, v1)
        keep = zm_ref[k, 2] > 0.0
        xv = (jnp.where(keep, xv[0] + dx0, xv[0]),
              jnp.where(keep, xv[1] + dx1, xv[1]),
              jnp.where(keep, wrap_angle(xv[2] + dx2), xv[2]))
        Pv = tuple(jnp.where(keep, n, o) for n, o in zip(Pv_new, Pv))
    xvr_ref[0:1, :] = xv[0]
    xvr_ref[1:2, :] = xv[1]
    xvr_ref[2:3, :] = xv[2]
    for i in range(6):
        pvr_ref[i:i + 1, :] = Pv[i]


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def fs2_refine_tpu(xv, Pv, lmx, lmy, p00, p01, p11, z, matched, R,
                   block: int | None = DEFAULT_BLOCK,
                   interpret: bool = False):
    """Fused FS2 proposal refinement. Args: xv [3, P]; Pv [6, P] packed
    symmetric; gathered landmark planes [K, P]; z [K, 2]; matched [K];
    R [2, 2]. Returns (xv_r [3, P], Pv_r [6, P]) — semantically identical
    to models.fastslam2._refine_proposal (golden-tested)."""
    K, P = lmx.shape
    block = block or _auto_block(K)
    if P <= block:
        block = -(-P // LANE) * LANE
    P_pad = -(-P // block) * block
    args = [_pad_lanes(x, P_pad)
            for x in (xv, Pv, lmx, lmy, p00, p01, p11)]
    # Per-observation scalars (range, bearing, matched) in SMEM.
    zm = jnp.concatenate(
        [z.astype(xv.dtype),
         matched.astype(xv.dtype)[:, None]], axis=1)        # [K, 3]
    r_row = jnp.asarray([R[0, 0], R[0, 1], R[1, 1]],
                        xv.dtype).reshape(1, 3)

    grid, b = _grid_block(P_pad, block)
    plane = pl.BlockSpec((K, b), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    xv_r, Pv_r = pl.pallas_call(
        _refine_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((3, b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            plane, plane, plane, plane, plane,
            pl.BlockSpec((K, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((3, b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((3, P_pad), xv.dtype),
                   jax.ShapeDtypeStruct((6, P_pad), xv.dtype)],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(*args, zm, r_row)
    return xv_r[:, :P], Pv_r[:, :P]


# ---------------------------------------------------------------------------
# Kernel 4: fully-fused in-place FS1 update (gather + Jacobians +
# likelihood + feature EKF + new-feature init + scatter, one state pass)
# ---------------------------------------------------------------------------

def _col(ref, col, K):
    """[K, 1] sublane vector from column ``col`` of an SMEM [K, c]
    array (K static, unrolled scalar reads)."""
    return jnp.concatenate([ref[k, col][None, None] for k in range(K)],
                           axis=0)


def _lane(ref, col, K):
    """[1, K] lane vector from column ``col`` of an SMEM [K, c]."""
    return jnp.concatenate([ref[k, col][None, None] for k in range(K)],
                           axis=1)


def _exact_matmul(sel_bf16, x):
    """Exact one-hot contraction sel @ x via the 3-way bf16 mantissa
    split of x (slam_tpu.ops.pallas.gather): every product is
    (value * 1.0) or 0, so the sum is the selected value bit-exactly."""
    from slam_tpu.ops.pallas.gather import _split3_bf16
    xa, xb, xc = _split3_bf16(x)
    return (jnp.dot(sel_bf16, xa, preferred_element_type=jnp.float32)
            + jnp.dot(sel_bf16, xb, preferred_element_type=jnp.float32)
            + jnp.dot(sel_bf16, xc, preferred_element_type=jnp.float32))


def _fused_update_kernel(xv_ref, lm_ref, lmP_ref, zm_ref, slt_ref,
                         r_ref, dlogw_ref, lmo_ref, lmPo_ref,
                         *, L: int, K: int):
    """One VMEM-resident pass per lane block: landmark gather (one-hot
    MXU), Jacobians, per-obs log-likelihood, matched-feature 2x2 EKF
    updates, new-feature initialization, and the combined scatter-back
    — with the landmark planes aliased in place.

    Replaces the round-3 chain gather_landmarks -> _observe_call ->
    scatter_slots -> add_new_features, whose HLO moved the [5L, P]
    landmark state ~4x per observe (gather-relayout copies, the
    one-hot rewrite, and lax.cond carry copies; see the round-4 trace
    notes in BENCH_NOTES.md)."""
    lane_l = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    sub_l = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)

    slotm_c = _col(slt_ref, 0, K)                     # [K, 1]
    slotm_r = _lane(slt_ref, 0, K)                    # [1, K]
    slotn_r = _lane(slt_ref, 1, K)
    z0 = _col(zm_ref, 0, K)
    z1 = _col(zm_ref, 1, K)
    m_col = _col(zm_ref, 2, K)                        # matched [K, 1]
    m_row = _lane(zm_ref, 2, K)                       # [1, K]
    n_row = _lane(zm_ref, 3, K)                       # new-ok [1, K]

    # Gather one-hot [K, L] (unmatched park at slot 0, as the unfused
    # gather does) and masked scatter one-hots [L, K].
    sel = (lane_l == slotm_c).astype(jnp.bfloat16)
    selT_m = ((sub_l == slotm_r) & (m_row > 0)).astype(jnp.bfloat16)
    selT_n = ((sub_l == slotn_r) & (n_row > 0)).astype(jnp.bfloat16)
    keep = 1.0 - (jnp.sum(selT_m, axis=1, keepdims=True)
                  + jnp.sum(selT_n, axis=1, keepdims=True))  # [L, 1]

    lmx = _exact_matmul(sel, lm_ref[0:L, :])
    lmy = _exact_matmul(sel, lm_ref[L:2 * L, :])
    p00 = _exact_matmul(sel, lmP_ref[0:L, :])
    p01 = _exact_matmul(sel, lmP_ref[L:2 * L, :])
    p11 = _exact_matmul(sel, lmP_ref[2 * L:3 * L, :])

    r00, r01, r11 = r_ref[0, 0], r_ref[0, 1], r_ref[0, 2]
    xvx, xvy, xvt = (xv_ref[0:1, :], xv_ref[1:2, :], xv_ref[2:3, :])
    J = pk.jacobians_planes(xvx, xvy, xvt, lmx, lmy, p00, p01, p11,
                            r00, r01, r11)
    v0 = z0 - J.zr
    v1 = wrap_angle(z1 - J.zb)

    logl = pk.log_gauss2_planes(v0, v1, J.s00, J.s01, J.s11)
    dlogw_ref[:, :] = jnp.sum(logl * m_col, axis=0, keepdims=True)

    upd = pk.feature_update_planes(lmx, lmy, p00, p01, p11, v0, v1, J)
    ini = pk.feature_init_planes(xvx, xvy, xvt, z0, z1, r00, r01, r11)

    def scat(rows, u, i):
        return (rows * keep + _exact_matmul(selT_m, u)
                + _exact_matmul(selT_n, i))

    lmo_ref[0:L, :] = scat(lm_ref[0:L, :], upd.nx, ini[0])
    lmo_ref[L:2 * L, :] = scat(lm_ref[L:2 * L, :], upd.ny, ini[1])
    lmPo_ref[0:L, :] = scat(lmP_ref[0:L, :], upd.np00, ini[2])
    lmPo_ref[L:2 * L, :] = scat(lmP_ref[L:2 * L, :], upd.np01, ini[3])
    lmPo_ref[2 * L:3 * L, :] = scat(lmP_ref[2 * L:3 * L, :], upd.np11,
                                    ini[4])


def _fused_block(P: int, L: int) -> int | None:
    """Largest LANE-multiple block dividing P that fits the budget
    (the in/out landmark blocks dominate the working set); None if P
    is not a LANE multiple (callers fall back to the unfused path)."""
    if P % LANE != 0:
        return None
    per_lane = (2 * (2 * (3 + 5 * L) + 1) + 45 * 14 + 200) * 4
    cap = _VMEM_BUDGET_BYTES * 2 // per_lane
    if cap < LANE:
        # One lane block of in+out landmark state alone would blow
        # VMEM (very large per-particle capacity, e.g. the full-10k
        # map) — callers fall back to the unfused HBM path.
        return None
    best = None
    for d in range(1, P // LANE + 1):
        if (P // LANE) % d == 0 and d * LANE <= cap:
            best = d * LANE
    return best


@functools.partial(jax.jit, static_argnames=("interpret", "psum_axis"))
def fs1_update_tpu(state, z, slot, matched, slot_new, ok_new, R,
                   interpret: bool = False,
                   psum_axis: str | None = None):
    """Fused in-place FS1 observation update on a ParticleState:
    weight delta + matched-feature EKF + new-feature planes in ONE
    kernel pass over the landmark state (aliased — no full-buffer
    rewrite, no gather relayout). Semantically identical to
    fs1_observe_tpu + add_new_features' plane writes (golden-tested in
    tests/test_pallas.py); the id-table/count bookkeeping stays with
    the caller."""
    P = state.n_particles
    L = state.capacity
    K = z.shape[0]
    B = _fused_block(P, L)
    assert B is not None, "P must be LANE-aligned for the fused path"
    lm2 = state.lm.reshape(2 * L, P)
    lmP2 = state.lm_P.reshape(3 * L, P)
    zm = jnp.stack([z[:, 0], z[:, 1],
                    matched.astype(z.dtype),
                    ok_new.astype(z.dtype)], axis=1)         # [K, 4]
    slt = jnp.stack([jnp.where(matched, slot, 0),
                     jnp.where(ok_new, slot_new, 0)],
                    axis=1).astype(jnp.int32)                # [K, 2]
    r_row = jnp.asarray([R[0, 0], R[0, 1], R[1, 1]],
                        state.xv.dtype).reshape(1, 3)

    grid = P // B
    dlogw, lm_o, lmP_o = pl.pallas_call(
        functools.partial(_fused_update_kernel, L=L, K=K),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((3, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * L, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * L, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),           # zm
            pl.BlockSpec(memory_space=pltpu.SMEM),           # slt
            pl.BlockSpec((1, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),           # R
        ],
        out_specs=[
            pl.BlockSpec((1, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * L, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * L, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, P), state.xv.dtype),
                   jax.ShapeDtypeStruct((2 * L, P), state.xv.dtype),
                   jax.ShapeDtypeStruct((3 * L, P), state.xv.dtype)],
        input_output_aliases={1: 1, 2: 2},
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(state.xv, lm2, lmP2, zm, slt, r_row)
    d = dlogw[0]
    if psum_axis is not None:
        # Landmark-sharded caller: each shard's kernel saw only its
        # owned slots; the per-particle log-likelihood is the sum of
        # the owners' contributions.
        d = jax.lax.psum(d, psum_axis)
    return state._replace(logw=state.logw + d,
                          lm=lm_o.reshape(2, L, P),
                          lm_P=lmP_o.reshape(3, L, P))


def fs1_observe_tpu(state, z, slot, matched, R,
                    block: int = DEFAULT_BLOCK, interpret: bool = False):
    """Fused FastSLAM1 observation update on a ParticleState: gathers the
    matched landmark planes, runs the fused kernel, scatters the updated
    planes back and applies the weight delta. Semantically identical to
    the unfused path in fs1_update (golden-tested in
    tests/test_pallas.py)."""
    from slam_tpu.models import rbpf
    lmx, lmy, p00, p01, p11 = rbpf.gather_landmarks(state, slot)
    dlogw, nx, ny, np00, np01, np11 = _observe_call(
        state.xv, lmx, lmy, p00, p01, p11, z, matched,
        jnp.asarray(R, state.xv.dtype), block=block, interpret=interpret)

    lm = rbpf.scatter_slots(state.lm, slot, jnp.stack([nx, ny]),
                            matched)
    lm_P = rbpf.scatter_slots(state.lm_P, slot,
                              jnp.stack([np00, np01, np11]), matched)
    return state._replace(logw=state.logw + dlogw[0], lm=lm, lm_P=lm_P)
