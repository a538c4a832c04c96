"""Distributed Schur-complement bundle adjustment.

The landmark axis shards over a 1-D device mesh: each shard assembles the
normal-equation pieces for ITS landmark block (every observation belongs
to exactly one landmark, hence to exactly one shard) and contributes its
slice of the Schur contraction

    S_obs = sum_shards [ App_obs_local - W_local All_local^-1 W_local' ]

via one psum of a [3T, 3T] partial — the pose system is tiny relative to
the landmark system, which is the point of the Schur trick. The reduced
pose solve is replicated; the landmark back-substitution
dl = All^-1 (bl - W' dp) is local to each shard. Odometry factors and the
gauge prior are landmark-free and assembled outside the shard_map.

Exact: matches the single-chip solver bit-for-near (f32 reduction order)
— tested against solve_ba on the virtual CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from slam_tpu.geometry import wrap_angle
from slam_tpu.posegraph.ba import (
    PRIOR_INFO,
    BAProblem,
    _ba_cost,
    _obs_terms,
    _odom_residual_jacobians,
    _prior_residual,
)

_HIGHEST = jax.lax.Precision.HIGHEST
LM_AXIS = "l"


def _assemble_local(poses, lm_local, z, lm_idx, mask, Rinv, lam,
                    L_local: int, axis: str):
    """Per-shard observation-side assembly + Schur partials."""
    T = poses.shape[0]
    dtype = poses.dtype
    lo = lax.axis_index(axis) * L_local
    own = mask & (lm_idx >= lo) & (lm_idx < lo + L_local)
    local_idx = jnp.clip(lm_idx - lo, 0, L_local - 1)

    Hv, Hf, r = _obs_terms(poses, lm_local, z, local_idx, own)
    HvR = jnp.einsum("tkab,ac->tkbc", Hv, Rinv, precision=_HIGHEST)
    App_diag = lax.psum(
        jnp.einsum("tkab,tkbc->tac", HvR, Hv, precision=_HIGHEST), axis)
    bp_obs = lax.psum(
        jnp.einsum("tkab,tkb->ta", HvR, r, precision=_HIGHEST), axis)

    HfR = jnp.einsum("tkab,ac->tkbc", Hf, Rinv, precision=_HIGHEST)
    All_terms = jnp.einsum("tkab,tkbc->tkac", HfR, Hf,
                           precision=_HIGHEST)
    bl_terms = jnp.einsum("tkab,tkb->tka", HfR, r, precision=_HIGHEST)
    flat_idx = local_idx.reshape(-1)
    ok = own.reshape(-1)
    drop_idx = jnp.where(ok, flat_idx, L_local)
    All = jnp.zeros((L_local, 2, 2), dtype).at[drop_idx].add(
        All_terms.reshape(-1, 2, 2), mode="drop")
    bl = jnp.zeros((L_local, 2), dtype).at[drop_idx].add(
        bl_terms.reshape(-1, 2), mode="drop")

    Wt = jnp.einsum("tkab,tkbc->tkac", HvR, Hf, precision=_HIGHEST)
    W = jnp.zeros((T, 3, L_local, 2), dtype)
    t_idx = jnp.broadcast_to(jnp.arange(T)[:, None],
                             lm_idx.shape).reshape(-1)
    W = W.at[t_idx, :, drop_idx, :].add(Wt.reshape(-1, 3, 2),
                                        mode="drop")
    W = W.reshape(T * 3, L_local * 2)

    All = All + lam * jnp.eye(2, dtype=dtype)
    det = jnp.maximum(All[:, 0, 0] * All[:, 1, 1]
                      - All[:, 0, 1] * All[:, 1, 0], 1e-20)
    Allinv = jnp.stack([
        jnp.stack([All[:, 1, 1], -All[:, 0, 1]], -1),
        jnp.stack([-All[:, 1, 0], All[:, 0, 0]], -1)], -2) \
        / det[:, None, None]

    WA = jnp.einsum("plc,lcd->pld", W.reshape(3 * T, L_local, 2),
                    Allinv,
                    precision=_HIGHEST).reshape(3 * T, 2 * L_local)
    SW = lax.psum(jnp.matmul(WA, W.T, precision=_HIGHEST), axis)
    rhs_lm = lax.psum(WA @ bl.reshape(-1), axis)
    return App_diag, bp_obs, SW, rhs_lm, W, Allinv, bl


def make_sharded_gn_step(mesh: Mesh, T: int, L: int):
    """Builds one jitted sharded Gauss-Newton step for fixed shapes."""
    axis = mesh.axis_names[0]
    S_dev = mesh.devices.size
    if L % S_dev:
        raise ValueError(f"L={L} must divide over {S_dev} devices")
    L_local = L // S_dev
    rep = P()

    def step(poses, landmarks, odom, odom_info, z, lm_idx, mask, R,
             anchor, damping):
        dtype = poses.dtype
        Rinv = jnp.linalg.inv(jnp.asarray(R, dtype))
        lam = jnp.asarray(damping, dtype)

        @partial(shard_map, mesh=mesh,
                 in_specs=(rep, P(axis, None), rep, rep, rep),
                 out_specs=(rep, rep, rep, rep, P(None, axis),
                            P(axis, None, None), P(axis, None)),
                 check_vma=False)
        def assemble(poses, lm_local, z_, idx_, mask_):
            return _assemble_local(poses, lm_local, z_, idx_, mask_,
                                   Rinv, lam, L_local, axis)

        App_diag, bp_obs, SW, rhs_lm, W_sh, Allinv_sh, bl_sh = assemble(
            poses, landmarks, z, lm_idx, mask)

        # Pose-side (landmark-free) terms: odometry chain + gauge.
        r_od, Ja, Jb = _odom_residual_jacobians(poses, odom)
        Info = jnp.asarray(odom_info, dtype)
        JaI = jnp.einsum("tab,bc->tac", jnp.swapaxes(Ja, -1, -2), Info,
                         precision=_HIGHEST)
        JbI = jnp.einsum("tab,bc->tac", jnp.swapaxes(Jb, -1, -2), Info,
                         precision=_HIGHEST)
        App = jnp.zeros((T, 3, T, 3), dtype)
        tt = jnp.arange(T)
        App = App.at[tt, :, tt, :].add(App_diag)
        t1 = jnp.arange(T - 1)
        App = App.at[t1, :, t1, :].add(
            jnp.einsum("tab,tbc->tac", JaI, Ja, precision=_HIGHEST))
        Aab = jnp.einsum("tab,tbc->tac", JaI, Jb, precision=_HIGHEST)
        App = App.at[t1, :, t1 + 1, :].add(Aab)
        App = App.at[t1 + 1, :, t1, :].add(jnp.swapaxes(Aab, -1, -2))
        App = App.at[t1 + 1, :, t1 + 1, :].add(
            jnp.einsum("tab,tbc->tac", JbI, Jb, precision=_HIGHEST))
        App = App.at[0, :, 0, :].add(
            PRIOR_INFO * jnp.eye(3, dtype=dtype))
        App = App.reshape(T * 3, T * 3)

        bp = jnp.zeros((T, 3), dtype)
        bp = bp + bp_obs
        bp = bp.at[:-1].add(-jnp.einsum("tab,tb->ta", JaI, r_od,
                                        precision=_HIGHEST))
        bp = bp.at[1:].add(-jnp.einsum("tab,tb->ta", JbI, r_od,
                                       precision=_HIGHEST))
        bp = bp.at[0].add(-PRIOR_INFO * _prior_residual(poses, anchor))

        S = App + lam * jnp.eye(3 * T, dtype=dtype) - SW
        rhs = bp.reshape(-1) - rhs_lm
        dp = jax.scipy.linalg.solve(S, rhs, assume_a="pos")

        # Landmark back-substitution, local per shard.
        @partial(shard_map, mesh=mesh,
                 in_specs=(P(None, axis), P(axis, None, None),
                           P(axis, None), rep),
                 out_specs=P(axis, None), check_vma=False)
        def backsub(W_local, Allinv_local, bl_local, dp_):
            Ll = Allinv_local.shape[0]
            dl_rhs = bl_local.reshape(-1) - jnp.matmul(
                W_local.T, dp_, precision=_HIGHEST)
            return jnp.einsum("lcd,ld->lc", Allinv_local,
                              dl_rhs.reshape(Ll, 2),
                              precision=_HIGHEST)

        dl = backsub(W_sh, Allinv_sh, bl_sh, dp)

        new_poses = poses + dp.reshape(T, 3)
        new_poses = new_poses.at[:, 2].set(wrap_angle(new_poses[:, 2]))
        return new_poses, landmarks + dl

    return jax.jit(step)


def solve_ba_sharded(prob: BAProblem, mesh: Mesh, iters: int = 10,
                     damping: float = 1e-3, tol: float = 1e-8,
                     max_retries: int = 6):
    """Distributed Schur-complement BA over a landmark-sharded mesh.

    Same Levenberg-Marquardt acceptance loop as solve_ba (the cost
    check reuses the single-chip _ba_cost; XLA re-gathers the sharded
    landmark slices, which is cheap next to the Schur contraction)."""
    step = make_sharded_gn_step(mesh, prob.T, prob.L)
    poses = jnp.asarray(prob.poses0, jnp.float32)
    landmarks = jnp.asarray(prob.landmarks0, jnp.float32)
    anchor = poses[0]
    static = (prob.odom, prob.odom_info, prob.z, prob.lm_idx, prob.mask,
              prob.R, anchor)
    lam = float(damping)
    cost = float(_ba_cost(poses, landmarks, *static))
    for _ in range(iters):
        accepted = False
        for _retry in range(max_retries + 1):
            trial_p, trial_l = step(poses, landmarks, *static,
                                    jnp.float32(lam))
            trial_cost = float(_ba_cost(trial_p, trial_l, *static))
            if np.isfinite(trial_cost) and trial_cost <= cost:
                accepted = True
                break
            lam = min(lam * 10.0, 1e8)
        if not accepted:
            break
        poses, landmarks = trial_p, trial_l
        gain = cost - trial_cost
        cost = trial_cost
        lam = max(lam / 3.0, 1e-9)
        if gain <= tol * max(cost, 1.0):
            break
    return poses, landmarks
