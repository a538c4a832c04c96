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
TILE_SUB = 8
DEFAULT_BLOCK = None  # auto (VMEM-aware)
# The kernels' live working set is ~42 [K, B] f32 plane-equivalents
# (measured 18.8 MB at block=8064, K=14) including Mosaic's
# double-buffered grid I/O. A v5e core has 128 MB of VMEM but Mosaic's
# default budget is 16 MB, which capped blocks at 2048; we size blocks
# against a 24 MB budget and raise the compiler limit accordingly
# (live-validated at block 4096/8192 on a v5e, round 3).
_VMEM_BUDGET_BYTES = 24 * 1024 * 1024
# Allowance only (Mosaic rejects kernels above it; it allocates what
# the kernel uses): 96 MB of the v5e core's 128 MB, matching
# slam_tpu.ops.pallas.gather — the deferred kernel's full-10k tiling
# measured 66.7 MB of scoped vmem against the old 64 MB cap.
_VMEM_LIMIT_BYTES = 96 * 1024 * 1024
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


def _fused_update_math(xv_ref, planes, zm_ref, slt_ref, r_ref,
                       s_lo, Lseg: int, K: int):
    """Shared segment-ownership observe-update math of kernels 4 and 5:
    slot gather (one-hot MXU), Jacobians, per-obs log-likelihood,
    matched-feature 2x2 EKF, new-feature init, combined scatter.
    ``planes``: the five [Lseg, B] landmark plane values of this
    segment (pre-permuted for kernel 5). Returns (dpart [1, B], five
    output planes)."""
    lane_l = jax.lax.broadcasted_iota(jnp.int32, (1, Lseg), 1)
    sub_l = jax.lax.broadcasted_iota(jnp.int32, (Lseg, 1), 0)

    slotm_c = _col(slt_ref, 0, K)                     # [K, 1]
    slotm_r = _lane(slt_ref, 0, K)                    # [1, K]
    slotn_r = _lane(slt_ref, 1, K)
    z0 = _col(zm_ref, 0, K)
    z1 = _col(zm_ref, 1, K)
    m_col = _col(zm_ref, 2, K)                        # matched [K, 1]
    m_row = _lane(zm_ref, 2, K)                       # [1, K]
    n_row = _lane(zm_ref, 3, K)                       # new-ok [1, K]

    # Segment ownership: an observation belongs to the segment holding
    # its slot. Unowned observations park at local row 0 (real, finite
    # landmark values — exactly the unfused gather's unmatched-at-slot-0
    # semantics) and are masked out of the likelihood and the scatter.
    own_m_c = ((m_col > 0) & (slotm_c >= s_lo)
               & (slotm_c < s_lo + Lseg))             # [K, 1] bool
    own_m_r = ((m_row > 0) & (slotm_r >= s_lo)
               & (slotm_r < s_lo + Lseg))             # [1, K] bool
    own_n_r = ((n_row > 0) & (slotn_r >= s_lo)
               & (slotn_r < s_lo + Lseg))
    lslot_c = jnp.where(own_m_c, slotm_c - s_lo, 0)
    lslot_m_r = jnp.where(own_m_r, slotm_r - s_lo, 0)
    lslot_n_r = jnp.where(own_n_r, slotn_r - s_lo, 0)

    # Gather one-hot [K, Lseg] and masked scatter one-hots [Lseg, K].
    sel = (lane_l == lslot_c).astype(jnp.bfloat16)
    selT_m = ((sub_l == lslot_m_r) & own_m_r).astype(jnp.bfloat16)
    selT_n = ((sub_l == lslot_n_r) & own_n_r).astype(jnp.bfloat16)
    keep = 1.0 - (jnp.sum(selT_m, axis=1, keepdims=True)
                  + jnp.sum(selT_n, axis=1, keepdims=True))  # [Lseg, 1]

    lmx, lmy, p00, p01, p11 = [_exact_matmul(sel, pl_) for pl_ in planes]

    r00, r01, r11 = r_ref[0, 0], r_ref[0, 1], r_ref[0, 2]
    xvx, xvy, xvt = (xv_ref[0:1, :], xv_ref[1:2, :], xv_ref[2:3, :])
    J = pk.jacobians_planes(xvx, xvy, xvt, lmx, lmy, p00, p01, p11,
                            r00, r01, r11)
    v0 = z0 - J.zr
    v1 = wrap_angle(z1 - J.zb)

    logl = pk.log_gauss2_planes(v0, v1, J.s00, J.s01, J.s11)
    dpart = jnp.sum(logl * own_m_c.astype(logl.dtype), axis=0,
                    keepdims=True)

    upd = pk.feature_update_planes(lmx, lmy, p00, p01, p11, v0, v1, J)
    ini = pk.feature_init_planes(xvx, xvy, xvt, z0, z1, r00, r01, r11)

    def scat(rows, u, i):
        return (rows * keep + _exact_matmul(selT_m, u)
                + _exact_matmul(selT_n, i))

    outs = (scat(planes[0], upd.nx, ini[0]),
            scat(planes[1], upd.ny, ini[1]),
            scat(planes[2], upd.np00, ini[2]),
            scat(planes[3], upd.np01, ini[3]),
            scat(planes[4], upd.np11, ini[4]))
    return dpart, outs


def _fused_update_kernel(xv_ref, lm_ref, lmP_ref, zm_ref, slt_ref,
                         r_ref, dlogw_ref, lmo_ref, lmPo_ref,
                         *, Lseg: int, K: int):
    """One VMEM-resident pass per (lane block x landmark segment):
    landmark gather (one-hot MXU), Jacobians, per-obs log-likelihood,
    matched-feature 2x2 EKF updates, new-feature initialization, and
    the combined scatter-back — with the landmark planes aliased in
    place.

    Replaces the round-3 chain gather_landmarks -> _observe_call ->
    scatter_slots -> add_new_features, whose HLO moved the [5L, P]
    landmark state ~4x per observe (gather-relayout copies, the
    one-hot rewrite, and lax.cond carry copies; see the round-4 trace
    notes in BENCH_NOTES.md).

    Segmentation (round 5): the grid's second dim walks row groups of
    ``Lseg`` landmark slots so the fused path runs at ANY per-particle
    capacity (the full-10k BASELINE config #5 map; one lane block of
    L = 10k state no longer needs to fit VMEM at once). Known
    association puts every observation in exactly one segment, so each
    segment updates the observations whose slot it owns — the same
    ownership-mask pattern slam_tpu.parallel.landmarks uses across
    shards — and the per-particle weight delta accumulates across the
    (innermost) segment iterations in the revisited dlogw block."""
    seg = pl.program_id(1)
    planes = (lm_ref[0], lm_ref[1], lmP_ref[0], lmP_ref[1], lmP_ref[2])
    dpart, outs = _fused_update_math(xv_ref, planes, zm_ref, slt_ref,
                                     r_ref, seg * Lseg, Lseg, K)

    # The dlogw block is indexed by the lane block alone, so it stays
    # resident across the (innermost) segment dim and accumulates.
    @pl.when(seg == 0)
    def _():
        dlogw_ref[:, :] = dpart

    @pl.when(seg != 0)
    def _():
        dlogw_ref[:, :] += dpart

    lmo_ref[0] = outs[0]
    lmo_ref[1] = outs[1]
    lmPo_ref[0] = outs[2]
    lmPo_ref[1] = outs[3]
    lmPo_ref[2] = outs[4]


# Non-landmark VMEM working set, in [*, B]-plane equivalents: the ~45
# K-shaped temporaries (gathered planes, Jacobians, update, init,
# likelihood) plus xv/dlogw I/O and slack. Calibrated against the
# round-3/4 live measurements (18.8 MB at block=8064, K=14).
_TEMP_K_PLANES = 45
_TEMP_MISC_LANES = 214


def _seg_bytes(B: int, Lseg: int, K: int) -> int:
    """VMEM bytes for one (lane block, segment) program: double-buffered
    in+out landmark blocks (2 x 2 x 5 planes) + K-temps + misc."""
    return 4 * (B * (20 * Lseg + _TEMP_K_PLANES * K + _TEMP_MISC_LANES)
                + 4 * K * Lseg)


def _fused_tiling(P: int, L: int, K: int = 14
                  ) -> tuple[int, int] | None:
    """(lane block B, landmark segment Lseg) for the fused update
    kernel, or None when the fused path cannot run (P not LANE-aligned).
    Prefers an unsegmented pass with the largest lane block (fewer grid
    programs); falls back to row segments when one lane block of full-L
    landmark state exceeds the VMEM budget — this is what lets the
    kernel run at the full-10k per-particle capacity."""
    if P % LANE != 0:
        return None
    budget = _VMEM_BUDGET_BYTES * 2

    # Unsegmented: largest LANE-multiple block dividing P that fits.
    best = None
    for d in range(1, P // LANE + 1):
        if (P // LANE) % d == 0 and d * LANE <= 8192 \
                and _seg_bytes(d * LANE, L, K) <= budget:
            best = d * LANE
    if best is not None:
        return best, L

    # Segmented: moderate lane blocks, largest dividing segment that
    # fits (sublane-aligned segments preferred for dense tiling).
    for B in (512, 256, 128):
        if P % B != 0:
            continue
        best_seg, best_seg8 = None, None
        for d in range(1, L + 1):
            if L % d == 0 and _seg_bytes(B, d, K) <= budget:
                best_seg = d if best_seg is None else max(best_seg, d)
                if d % 8 == 0:
                    best_seg8 = d
        seg = best_seg8 or best_seg
        if seg is not None and seg < L:
            return B, seg
    return None


def _fused_block(P: int, L: int, K: int = 14) -> int | None:
    """Caller gate (kept API): the fused update path is available iff a
    tiling exists; returns its lane block."""
    t = _fused_tiling(P, L, K)
    return None if t is None else t[0]


@functools.partial(jax.jit, static_argnames=("interpret", "psum_axis",
                                             "tiling"))
def fs1_update_tpu(state, z, slot, matched, slot_new, ok_new, R,
                   interpret: bool = False,
                   psum_axis: str | None = None,
                   tiling: tuple[int, int] | None = None):
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
    tiling = tiling or _fused_tiling(P, L, K)
    assert tiling is not None, \
        "P must be LANE-aligned for the fused path"
    B, Lseg = tiling
    zm = jnp.stack([z[:, 0], z[:, 1],
                    matched.astype(z.dtype),
                    ok_new.astype(z.dtype)], axis=1)         # [K, 4]
    slt = jnp.stack([jnp.where(matched, slot, 0),
                     jnp.where(ok_new, slot_new, 0)],
                    axis=1).astype(jnp.int32)                # [K, 2]
    r_row = jnp.asarray([R[0, 0], R[0, 1], R[1, 1]],
                        state.xv.dtype).reshape(1, 3)

    lm_spec = pl.BlockSpec((2, Lseg, B), lambda i, s: (0, s, i),
                           memory_space=pltpu.VMEM)
    lmP_spec = pl.BlockSpec((3, Lseg, B), lambda i, s: (0, s, i),
                            memory_space=pltpu.VMEM)
    dlogw, lm_o, lmP_o = pl.pallas_call(
        functools.partial(_fused_update_kernel, Lseg=Lseg, K=K),
        grid=(P // B, L // Lseg),
        in_specs=[
            pl.BlockSpec((3, B), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM),
            lm_spec,
            lmP_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),           # zm
            pl.BlockSpec(memory_space=pltpu.SMEM),           # slt
            pl.BlockSpec((1, 3), lambda i, s: (0, 0),
                         memory_space=pltpu.SMEM),           # R
        ],
        out_specs=[
            pl.BlockSpec((1, B), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM),
            lm_spec,
            lmP_spec,
        ],
        out_shape=[jax.ShapeDtypeStruct((1, P), state.xv.dtype),
                   jax.ShapeDtypeStruct((2, L, P), state.xv.dtype),
                   jax.ShapeDtypeStruct((3, L, P), state.xv.dtype)],
        input_output_aliases={1: 1, 2: 2},
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(state.xv, state.lm, state.lm_P, zm, slt, r_row)
    d = dlogw[0]
    if psum_axis is not None:
        # Landmark-sharded caller: each shard's kernel saw only its
        # owned slots; the per-particle log-likelihood is the sum of
        # the owners' contributions.
        d = jax.lax.psum(d, psum_axis)
    return state._replace(logw=state.logw + d, lm=lm_o, lm_P=lmP_o)


# ---------------------------------------------------------------------------
# Kernel 6: fused multi-tick FS1 predict (in-kernel PRNG)
# ---------------------------------------------------------------------------

_TWO_PI = 6.283185307179586


def _sample_vg(vn, gn, l00, l10, l11, shape, add_noise: bool):
    """Per-tick control sample ~ N((vn, gn), L L') from the TPU
    hardware PRNG via Box-Muller, or the nominal controls broadcast
    when noise is off. prng_random_bits yields SIGNED int32 — bitcast
    before shifting or the arithmetic shift sign-extends half the
    draws negative (log of a negative -> NaN on chip); the 24-bit
    values are sign-bit-clear so the uint32->int32 bitcast before the
    float cast is value-preserving (Mosaic has no uint->float cast)."""
    if not add_noise:
        return (jnp.full(shape, vn, jnp.float32),
                jnp.full(shape, gn, jnp.float32))
    inv24 = jnp.float32(2.0 ** -24)
    b0 = jax.lax.bitcast_convert_type(
        pltpu.prng_random_bits(shape), jnp.uint32)
    b1 = jax.lax.bitcast_convert_type(
        pltpu.prng_random_bits(shape), jnp.uint32)
    # u1 in (0, 1] (never 0 for the log), u2 in [0, 1).
    u1 = jax.lax.bitcast_convert_type(
        (b0 >> 8) + 1, jnp.int32).astype(jnp.float32) * inv24
    u2 = jax.lax.bitcast_convert_type(
        b1 >> 8, jnp.int32).astype(jnp.float32) * inv24
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    e0 = r * jnp.cos(_TWO_PI * u2)
    e1 = r * jnp.sin(_TWO_PI * u2)
    return vn + l00 * e0, gn + l10 * e0 + l11 * e1



def _predict_kernel(xv_ref, ctl_ref, q_ref, seed_ref, xvo_ref,
                    *, T: int, B: int, wheelbase: float, dt: float,
                    add_noise: bool):
    """All ``T`` control ticks of the FS1 motion sample in one VMEM
    pass: per tick, two hardware-PRNG normal draws (Box-Muller) feed
    the control-noise Cholesky, then the bicycle step — the pose planes
    cross HBM once per SUPERSTEP instead of once per tick, and the
    ~12-op per-tick XLA dispatch chain (measured ~2.9 ms per 1M-lane
    superstep against a ~0.6 ms compute bound) collapses into one
    kernel. Replaces predictState x T (fastslam1.cpp:37-54)."""
    if add_noise:
        # Mosaic takes at most 2 seed words; mix the block id into the
        # first so every lane block draws a distinct stream.
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0), seed_ref[1])
    # Blocks come in sublane-blocked [3, 8, B/8] form: a [1, B] pose
    # row would run in the T(1, 128) layout at 1/8 VPU width (the
    # round-4 predict-layout lesson; see models.rbpf.tile_shape).
    SB = B // TILE_SUB
    x = xv_ref[0]
    y = xv_ref[1]
    th = xv_ref[2]
    l00, l10, l11 = q_ref[0, 0], q_ref[0, 1], q_ref[0, 2]
    for t in range(T):
        V, G = _sample_vg(ctl_ref[t, 0], ctl_ref[t, 1], l00, l10,
                          l11, (TILE_SUB, SB), add_noise)
        x = x + V * dt * jnp.cos(G + th)
        y = y + V * dt * jnp.sin(G + th)
        th = wrap_angle(th + V * dt * jnp.sin(G) / wheelbase)
    xvo_ref[0] = x
    xvo_ref[1] = y
    xvo_ref[2] = th


@functools.partial(jax.jit, static_argnames=("wheelbase", "dt",
                                             "add_noise", "interpret"))
def fs1_predict_multi_tpu(xv, key, controls, Q, *, wheelbase: float,
                          dt: float, add_noise: bool = True,
                          interpret: bool = False):
    """T control ticks of the FS1 predict in one kernel call.

    ``controls``: [T, 2] (v_nominal, g_nominal) per tick. The noise
    stream is the TPU hardware PRNG seeded from ``key`` (a different,
    statistically equivalent stream to the jnp path's threefry/rbg
    draws — moment-tested on chip in tools/smoke_predict.py)."""
    P = xv.shape[1]
    T = controls.shape[0]
    B = 65536
    while B > TILE_SUB and P % B:
        B //= 2
    assert P % B == 0 and B % TILE_SUB == 0, (P, B)
    SB = B // TILE_SUB
    Q = jnp.asarray(Q, jnp.float32)
    Lq = jnp.linalg.cholesky(Q + 1e-20 * jnp.eye(2, dtype=Q.dtype))
    q_row = jnp.stack([Lq[0, 0], Lq[1, 0], Lq[1, 1]]).reshape(1, 3)
    kd = jax.random.key_data(key).ravel().astype(jnp.uint32)
    seed = jnp.stack([kd[0], kd[-1]]).astype(jnp.int32)

    # Sublane-blocked view [3, 8, P/8] (free row-major bitcast): each
    # pose row runs as full (8, 128) VPU tiles instead of T(1, 128).
    xv3 = xv.reshape(3, TILE_SUB, P // TILE_SUB)
    out = pl.pallas_call(
        functools.partial(_predict_kernel, T=T, B=B,
                          wheelbase=wheelbase, dt=dt,
                          add_noise=add_noise),
        grid=(P // B,),
        in_specs=[
            pl.BlockSpec((3, TILE_SUB, SB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),           # controls
            pl.BlockSpec((1, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),           # chol(Q)
            pl.BlockSpec(memory_space=pltpu.SMEM),           # seed
        ],
        out_specs=pl.BlockSpec((3, TILE_SUB, SB),
                               lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, TILE_SUB, P // TILE_SUB),
                                       jnp.float32),
        input_output_aliases={0: 0},
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(xv3, controls.astype(jnp.float32), q_row, seed)
    return out.reshape(3, P)


def _predict_kernel_fs2(xv_ref, pv_ref, ctl_ref, q_ref, seed_ref,
                        xvo_ref, pvo_ref,
                        *, T: int, B: int, wheelbase: float, dt: float,
                        add_noise: bool):
    """FS2 variant of kernel 6: all T ticks of pose AND packed-
    symmetric pose-covariance propagation (Pv <- Gv Pv Gv' + Gu Q Gu',
    models.fastslam2.fs2_predict / fastslam2.cpp:70-105) in one VMEM
    pass. q_ref row: (l00, l10, l11, q00, q01, q11)."""
    if add_noise:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0), seed_ref[1])
    SB = B // TILE_SUB
    x = xv_ref[0]
    y = xv_ref[1]
    th = xv_ref[2]
    pv = [pv_ref[i] for i in range(6)]
    l00, l10, l11 = q_ref[0, 0], q_ref[0, 1], q_ref[0, 2]
    q00, q01, q11 = q_ref[0, 3], q_ref[0, 4], q_ref[0, 5]
    for t in range(T):
        V, G = _sample_vg(ctl_ref[t, 0], ctl_ref[t, 1], l00, l10,
                          l11, (TILE_SUB, SB), add_noise)
        sgt = jnp.sin(G + th)
        cgt = jnp.cos(G + th)
        sg = jnp.sin(G)
        cg = jnp.cos(G)
        al = -V * dt * sgt
        be = V * dt * cgt
        a, b, c, d, e, f = pv
        n00 = a + 2.0 * al * c + al * al * f
        n01 = b + al * e + be * c + al * be * f
        n02 = c + al * f
        n11 = d + 2.0 * be * e + be * be * f
        n12 = e + be * f
        g00, g01 = dt * cgt, al
        g10, g11 = dt * sgt, be
        g20 = dt * sg / wheelbase
        g21 = V * dt * cg / wheelbase

        def gq(gi0, gi1, gj0, gj1):
            return (gi0 * (q00 * gj0 + q01 * gj1)
                    + gi1 * (q01 * gj0 + q11 * gj1))

        pv = [n00 + gq(g00, g01, g00, g01),
              n01 + gq(g00, g01, g10, g11),
              n02 + gq(g00, g01, g20, g21),
              n11 + gq(g10, g11, g10, g11),
              n12 + gq(g10, g11, g20, g21),
              f + gq(g20, g21, g20, g21)]
        x = x + V * dt * cgt
        y = y + V * dt * sgt
        th = wrap_angle(th + V * dt * sg / wheelbase)
    xvo_ref[0] = x
    xvo_ref[1] = y
    xvo_ref[2] = th
    for i in range(6):
        pvo_ref[i] = pv[i]


@functools.partial(jax.jit, static_argnames=("wheelbase", "dt",
                                             "add_noise", "interpret"))
def fs2_predict_multi_tpu(xv, Pv, key, controls, Q, *, wheelbase: float,
                          dt: float, add_noise: bool = True,
                          interpret: bool = False):
    """T control ticks of the FS2 predict (pose + pose covariance) in
    one kernel call; see fs1_predict_multi_tpu for the PRNG contract."""
    P = xv.shape[1]
    T = controls.shape[0]
    B = 65536
    while B > TILE_SUB and P % B:
        B //= 2
    assert P % B == 0 and B % TILE_SUB == 0, (P, B)
    Q = jnp.asarray(Q, jnp.float32)
    Lq = jnp.linalg.cholesky(Q + 1e-20 * jnp.eye(2, dtype=Q.dtype))
    q_row = jnp.stack([Lq[0, 0], Lq[1, 0], Lq[1, 1],
                       Q[0, 0], Q[0, 1], Q[1, 1]]).reshape(1, 6)
    kd = jax.random.key_data(key).ravel().astype(jnp.uint32)
    seed = jnp.stack([kd[0], kd[-1]]).astype(jnp.int32)

    xv3 = xv.reshape(3, TILE_SUB, P // TILE_SUB)
    pv6 = Pv.reshape(6, TILE_SUB, P // TILE_SUB)
    SB = B // TILE_SUB
    xvo, pvo = pl.pallas_call(
        functools.partial(_predict_kernel_fs2, T=T, B=B,
                          wheelbase=wheelbase, dt=dt,
                          add_noise=add_noise),
        grid=(P // B,),
        in_specs=[
            pl.BlockSpec((3, TILE_SUB, SB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, TILE_SUB, SB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),           # controls
            pl.BlockSpec((1, 6), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),           # seed
        ],
        out_specs=[
            pl.BlockSpec((3, TILE_SUB, SB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, TILE_SUB, SB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, TILE_SUB, P // TILE_SUB),
                                 jnp.float32),
            jax.ShapeDtypeStruct((6, TILE_SUB, P // TILE_SUB),
                                 jnp.float32),
        ],
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(xv3, pv6, controls.astype(jnp.float32), q_row, seed)
    return xvo.reshape(3, P), pvo.reshape(6, P)


# ---------------------------------------------------------------------------
# Kernel 5: fused resample + update (deferred ancestor permutation)
# ---------------------------------------------------------------------------

def _deferred_kernel(lo_ref, nch_ref, ident_ref, xv_ref, zm_ref,
                     slt_ref, r_ref, lm_hbm, lmP_hbm, meta_hbm,
                     dlogw_ref, lmo_ref, lmPo_ref,
                     win, mwin, gath, sem,
                     *, L: int, Lseg: int, K: int, B: int, chunk: int,
                     Plim: int, int8: bool = True):
    """Fused FS1 observation update where the landmark planes are read
    THROUGH the pending resample permutation: per (lane block x landmark
    segment), DMA the ancestor window of the PRE-resample state, select
    the ancestors by offspring bounds (exact int8 byte-plane matmuls,
    as slam_tpu.ops.pallas.gather), then run the full kernel-4 body
    (slot gather, Jacobians, likelihood, matched-feature EKF, new-
    feature init, scatter) on the permuted values — so one superstep
    moves the landmark state through HBM exactly ONCE (read old buffer,
    write new buffer), replacing the round-4 chain of resample-cond
    operand copies + standalone bounds gather + aliased update kernel
    (each a full state pass; BENCH_NOTES round-4 stage table).

    Identity fast path: when a lane block's pending permutation is the
    identity (every skip superstep; precomputed per-block flag), the
    window IS the block — the one-hot build and selection matmuls are
    skipped entirely and the DMA'd window feeds the update math
    directly, so skip supersteps cost pure DMA.

    The offspring-bound rows ride their own DMA into a shared-lifetime
    scratch (the round-4 race lesson: metadata must share the data
    window's slot discipline, never a serially-reused side scratch).
    """
    i = pl.program_id(0)
    s = pl.program_id(1)
    nlane = pl.num_programs(0)
    nseg = pl.num_programs(1)
    t = i * nseg + s
    slot = jax.lax.rem(t, 2)
    lo = lo_ref[i]
    nch = nch_ref[i]
    ident = ident_ref[i]

    def copies(b_lo, c, seg, s_idx):
        col = pl.multiple_of(jnp.minimum(b_lo + c * chunk, Plim), LANE)
        dmas = []
        if Lseg == L:
            # Unsegmented: each plane stack's rows are contiguous —
            # one DMA per stack (per-block DMA issue latency is a
            # first-order cost at 1k+ grid programs).
            dmas.append(pltpu.make_async_copy(
                lm_hbm.at[:, pl.ds(col, chunk)],
                win.at[s_idx, pl.ds(0, 2 * L)], sem.at[s_idx, 0]))
            dmas.append(pltpu.make_async_copy(
                lmP_hbm.at[:, pl.ds(col, chunk)],
                win.at[s_idx, pl.ds(2 * L, 3 * L)], sem.at[s_idx, 1]))
        else:
            for g in range(2):
                dmas.append(pltpu.make_async_copy(
                    lm_hbm.at[pl.ds(g * L + seg * Lseg, Lseg),
                              pl.ds(col, chunk)],
                    win.at[s_idx, pl.ds(g * Lseg, Lseg)],
                    sem.at[s_idx, g]))
            for g in range(3):
                dmas.append(pltpu.make_async_copy(
                    lmP_hbm.at[pl.ds(g * L + seg * Lseg, Lseg),
                               pl.ds(col, chunk)],
                    win.at[s_idx, pl.ds((2 + g) * Lseg, Lseg)],
                    sem.at[s_idx, 2 + g]))
        dmas.append(pltpu.make_async_copy(
            meta_hbm.at[:, pl.ds(col, chunk)], mwin.at[s_idx],
            sem.at[s_idx, 5]))
        return dmas

    @pl.when(t == 0)
    def _():
        for dma in copies(lo, 0, 0, 0):
            dma.start()

    # Prefetch the NEXT grid step's first chunk (next segment of this
    # lane block, or segment 0 of the next block).
    @pl.when(t + 1 < nlane * nseg)
    def _():
        nxt_i = jnp.where(s + 1 < nseg, i, i + 1)
        nxt_s = jnp.where(s + 1 < nseg, s + 1, 0)
        for dma in copies(lo_ref[nxt_i], 0, nxt_s,
                          jax.lax.rem(t + 1, 2)):
            dma.start()

    for dma in copies(lo, 0, s, slot):
        dma.wait()

    # ---- resample selection (or identity passthrough) into gath ----
    @pl.when(ident != 0)
    def _():
        off0 = pl.multiple_of(
            lo - pl.multiple_of(jnp.minimum(lo, Plim), LANE), LANE)
        gath[:, :] = win[slot, :, pl.ds(off0, B)]

    @pl.when(ident == 0)
    def _():
        rows1 = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        pos = i * B + jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)

        def onehot_t(c, s_idx, masked):
            # Window lane r is ancestor g = start + r; it owns output
            # j iff Sm1[g] <= j < S[g]; `own` masks lanes to the chunk
            # owning them under the unclamped partition — needed ONLY
            # for extra chunks (clamped windows overlap their
            # predecessor; chunk 0 never clamps since lo <= Plim).
            sm1 = mwin[s_idx, 0:1, :]
            s_hi = mwin[s_idx, 1:2, :]
            oh = (sm1 <= pos) & (pos < s_hi)
            if masked:
                off = pl.multiple_of(
                    jnp.minimum(lo + c * chunk, Plim), LANE) - lo
                own = ((rows1 + off >= c * chunk)
                       & (rows1 + off < (c + 1) * chunk))
                oh = oh & own
            return oh

        from slam_tpu.ops.pallas.gather import _select, _select_int8

        @pl.when(nch > 1)
        def _():
            for dma in copies(lo, 1, s, 2):
                dma.start()

        select = _select_int8 if int8 else _select
        combine = (jnp.bitwise_or if int8 else jnp.add)
        acc = select(win[slot], onehot_t(0, slot, False),
                     transposed=True)

        def extra(c, acc):
            s_c = 2 + jax.lax.rem(c - 1, 2)

            @pl.when(c + 1 < nch)
            def _():
                for dma in copies(lo, c + 1, s,
                                  2 + jax.lax.rem(c, 2)):
                    dma.start()

            for dma in copies(lo, c, s, s_c):
                dma.wait()
            return combine(acc, select(win[s_c],
                                       onehot_t(c, s_c, True),
                                       transposed=True))

        acc = jax.lax.fori_loop(1, nch, extra, acc)
        if int8:
            acc = jax.lax.bitcast_convert_type(acc, jnp.float32)
        gath[:, :] = acc

    # ---- shared update body (kernel 4's math) on permuted values ----
    planes = tuple(gath[g * Lseg:(g + 1) * Lseg] for g in range(5))
    dpart, outs = _fused_update_math(xv_ref, planes, zm_ref, slt_ref,
                                     r_ref, s * Lseg, Lseg, K)

    @pl.when(s == 0)
    def _():
        dlogw_ref[:, :] = dpart

    @pl.when(s != 0)
    def _():
        dlogw_ref[:, :] += dpart

    lmo_ref[0] = outs[0]
    lmo_ref[1] = outs[1]
    lmPo_ref[0] = outs[2]
    lmPo_ref[1] = outs[3]
    lmPo_ref[2] = outs[4]


def _deferred_tiling(P: int, L: int, K: int, block: int, chunk: int
                     ) -> int | None:
    """Landmark segment size for the deferred kernel, or None when the
    deferred path cannot run. Working set adds the 4-slot DMA window
    (5*Lseg x chunk) and the gathered scratch to kernel 4's budget;
    the 3/2 factor covers Mosaic's selection temporaries (int8 byte
    planes + int32 accumulators), calibrated against the compiler's
    scoped-vmem accounting at the full-10k point (66.7 MB measured for
    a 46.8 MB naive estimate, round 5)."""
    if P % LANE != 0 or P % block != 0 or P < chunk or chunk < block:
        return None
    budget = _VMEM_BUDGET_BYTES * 2

    def fits(Lseg):
        est = 4 * (block * (10 * Lseg + _TEMP_K_PLANES * K
                            + _TEMP_MISC_LANES)
                   + 4 * 5 * Lseg * chunk       # window slots
                   + 5 * Lseg * block           # gath scratch
                   + 4 * K * Lseg)
        return est * 3 // 2 <= budget

    best, best8 = None, None
    for d in range(1, L + 1):
        if L % d == 0 and fits(d):
            best = d
            if d % 8 == 0:
                best8 = d
    return best8 or best


# Lane-block size shared by the deferred kernel and the metadata
# producer (slam_tpu.models.fastslam1.deferred_resample_bounds).
# chunk > block: most fire blocks then need a single window chunk
# (per-visit DMA latency dominates the selection — same sweep result
# as the standalone bounds gather); identity blocks slice their B
# columns out of the wider window at a dynamic LANE-aligned offset.
DEFERRED_BLOCK = 512
DEFERRED_CHUNK = 768


def deferred_tile_params(P: int) -> tuple[int, int]:
    """(block, chunk) for the deferred kernel at particle count P —
    shared by the kernel wrapper and the metadata producer (their
    per-block vectors must agree). Small P (tests) shrink both."""
    B = DEFERRED_BLOCK
    while B > LANE and P % B:
        B //= 2
    chunk = DEFERRED_CHUNK if P >= DEFERRED_CHUNK else B
    return B, chunk


def deferred_bounds_meta(S, block: int | None = None,
                         chunk: int | None = None,
                         stride: int = LANE):
    """Per-lane-block gather metadata for the deferred kernel:
    (lo, nch, ident), each [P // block] int32.

    The first/last owning ancestor per block is bounded CONSERVATIVELY
    from a stride-subsampled S via an all-pairs comparison (a
    [nb, P/stride] bool sum — tens of microseconds on the VPU) instead
    of jnp.searchsorted, whose ~20 serialized gather rounds cost
    ~0.7 ms per call at P = 1M. A window that starts up to `stride`
    early / ends late is CORRECT (the kernel's offspring-bound one-hot
    claims nothing outside [first, last]); identity blocks get their
    exact window so the fast path's column arithmetic holds. Callers
    run this under the resample gate's lax.cond."""
    P = S.shape[0]
    dB, dC = deferred_tile_params(P)
    block = block or dB
    chunk = chunk or dC
    nb = P // block
    # The identity flag stays ZERO on fire bounds: a truly-identity
    # block under a FIRING resample is vanishingly rare (measured
    # ancestor spans cluster at p5=468..p99=582 around block=512 —
    # tools/diag_fire_spans.py), ident=0 merely routes it through the
    # always-correct selection path, and computing the exact flags
    # cost a [P]-elementwise pass (~0.7 ms/firing at 1M). Skip
    # supersteps use identity_bounds_meta (all-ones) instead.
    ident = jnp.zeros((nb,), jnp.int32)

    # Coarse rank of the block edges in S: S_sub[s] = S[stride*(s+1)-1]
    # (the max of subgroup s), so #{s : S_sub[s] < t} * stride is a
    # lower bound on first = #{i : S_i <= t-1}, tight within `stride`.
    S_sub = S[stride - 1::stride]                       # [P // stride]
    edges = jnp.arange(nb, dtype=jnp.int32) * block
    lt = (S_sub[None, :] <= edges[:, None]).astype(jnp.int32)
    first_lb = jnp.sum(lt, axis=1) * stride             # <= true first
    le = (S_sub[None, :] <= edges[:, None] + (block - 1)
          ).astype(jnp.int32)
    last_ub = jnp.minimum(jnp.sum(le, axis=1) * stride + (stride - 1),
                          P - 1)                        # >= true last
    lo = (first_lb // LANE) * LANE
    nch = (last_ub - lo) // chunk + 1
    return lo, nch, ident


def identity_bounds_meta(P: int, block: int | None = None):
    """deferred_bounds_meta of the identity permutation (constants)."""
    block = block or deferred_tile_params(P)[0]
    nb = P // block
    return (jnp.arange(nb, dtype=jnp.int32) * block,
            jnp.ones((nb,), jnp.int32),
            jnp.ones((nb,), jnp.int32))


@functools.partial(jax.jit, static_argnames=("interpret", "block",
                                             "chunk", "lseg", "int8"))
def fs1_resample_update_tpu(state, S, meta_blocks, z, slot, matched,
                            slot_new, ok_new, R,
                            block: int | None = None,
                            chunk: int | None = None,
                            lseg: int | None = None,
                            int8: bool = True,
                            interpret: bool = False):
    """Fused resample + FS1 observation update: applies the PENDING
    ancestor permutation encoded by offspring bounds ``S`` [P]
    (slam_tpu.ops.resampling.offspring_bounds; identity = arange(1,P+1))
    to the landmark planes while computing the full observation update
    — one state pass total. ``meta_blocks`` = (lo, nch, ident) from
    deferred_bounds_meta(S). The pose/weight rows must already be
    permuted by the caller (they are consumed by predict before this
    kernel runs). Semantics: fs1_update_tpu(gather_by(S) applied first).
    """
    P = state.n_particles
    L = state.capacity
    K = z.shape[0]
    dB, dC = deferred_tile_params(P)
    block = block or dB
    chunk = chunk or dC
    B = block
    Lseg = lseg or _deferred_tiling(P, L, K, block, chunk)
    assert Lseg is not None, (P, L, K, block, chunk)

    S = S.astype(jnp.int32)
    Sm1 = jnp.concatenate([jnp.zeros((1,), jnp.int32), S[:-1]])
    lo, nch, ident = meta_blocks
    nb = P // B
    assert lo.shape[0] == nb, (lo.shape, nb)
    meta = jnp.stack([Sm1, S])                               # [2, P]

    lm2 = state.lm.reshape(2 * L, P)
    lmP2 = state.lm_P.reshape(3 * L, P)
    zm = jnp.stack([z[:, 0], z[:, 1],
                    matched.astype(z.dtype),
                    ok_new.astype(z.dtype)], axis=1)
    slt = jnp.stack([jnp.where(matched, slot, 0),
                     jnp.where(ok_new, slot_new, 0)],
                    axis=1).astype(jnp.int32)
    r_row = jnp.asarray([R[0, 0], R[0, 1], R[1, 1]],
                        state.xv.dtype).reshape(1, 3)

    Plim = P - chunk
    dlogw, lm_o, lmP_o = pl.pallas_call(
        functools.partial(_deferred_kernel, L=L, Lseg=Lseg, K=K, B=B,
                          chunk=chunk, Plim=Plim, int8=int8),
        grid=(nb, L // Lseg),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # lo
            pl.BlockSpec(memory_space=pltpu.SMEM),           # nch
            pl.BlockSpec(memory_space=pltpu.SMEM),           # ident
            pl.BlockSpec((3, B), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM),           # xv
            pl.BlockSpec(memory_space=pltpu.SMEM),           # zm
            pl.BlockSpec(memory_space=pltpu.SMEM),           # slt
            pl.BlockSpec((1, 3), lambda i, s: (0, 0),
                         memory_space=pltpu.SMEM),           # R
            pl.BlockSpec(memory_space=pl.ANY),               # lm2
            pl.BlockSpec(memory_space=pl.ANY),               # lmP2
            pl.BlockSpec(memory_space=pl.ANY),               # meta
        ],
        out_specs=[
            pl.BlockSpec((1, B), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Lseg, B), lambda i, s: (0, s, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Lseg, B), lambda i, s: (0, s, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, P), state.xv.dtype),
                   jax.ShapeDtypeStruct((2, L, P), state.xv.dtype),
                   jax.ShapeDtypeStruct((3, L, P), state.xv.dtype)],
        scratch_shapes=[
            pltpu.VMEM((4, 5 * Lseg, chunk), jnp.float32),
            pltpu.VMEM((4, 2, chunk), jnp.int32),
            pltpu.VMEM((5 * Lseg, B), jnp.float32),
            pltpu.SemaphoreType.DMA((4, 6)),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(lo, nch, ident, state.xv, zm, slt, r_row, lm2, lmP2, meta)
    return state._replace(logw=state.logw + dlogw[0],
                          lm=lm_o, lm_P=lmP_o)


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
