"""Range-bearing observation Jacobians — THE hot kernel.

jnp reference implementation of the reference's computeJacobians
(software path core.cpp:666-713; FPGA path core.cpp:586-664). Batch-first:
all inputs broadcast over arbitrary leading axes, so one call covers the
reference's every call site — FastSLAM1 computeWeight (all matched
landmarks), FastSLAM2 sampleProposal/likelihoodGivenXv (one at a time in
the reference, batched here), featureUpdate — and vmaps cleanly over the
particle axis.

Math (per landmark): with dx = xf - xv_x, dy = yf - xv_y, d2 = dx^2+dy^2,
d = sqrt(d2):

    zp = [d, wrap(atan2(dy, dx) - theta)]
    Hv = [[-dx/d,  -dy/d,  0],
          [ dy/d2, -dx/d2, -1]]
    Hf = [[ dx/d,   dy/d],
          [-dy/d2,  dx/d2]]
    Sf = Hf Pf Hf^T + R
"""

from __future__ import annotations

import jax.numpy as jnp

from slam_tpu.geometry import wrap_angle


def compute_jacobians(xv, xf, Pf, R):
    """Batched observation Jacobians.

    Args:
      xv: [..., 3] vehicle pose(s).
      xf: [..., 2] landmark mean(s).
      Pf: [..., 2, 2] landmark covariance(s).
      R:  [2, 2] observation noise (broadcast).

    Returns:
      zp [..., 2], Hv [..., 2, 3], Hf [..., 2, 2], Sf [..., 2, 2].
    """
    dx = xf[..., 0] - xv[..., 0]
    dy = xf[..., 1] - xv[..., 1]
    d2 = dx * dx + dy * dy
    # Guard the invalid/padded-landmark case (dx=dy=0): avoids inf/nan;
    # callers mask the outputs anyway.
    d2 = jnp.maximum(d2, 1e-12)
    d = jnp.sqrt(d2)

    zp = jnp.stack([d, wrap_angle(jnp.arctan2(dy, dx) - xv[..., 2])],
                   axis=-1)

    zeros = jnp.zeros_like(d)
    ones = jnp.ones_like(d)
    Hv = jnp.stack([
        jnp.stack([-dx / d, -dy / d, zeros], axis=-1),
        jnp.stack([dy / d2, -dx / d2, -ones], axis=-1),
    ], axis=-2)
    Hf = jnp.stack([
        jnp.stack([dx / d, dy / d], axis=-1),
        jnp.stack([-dy / d2, dx / d2], axis=-1),
    ], axis=-2)

    # Sf = Hf Pf Hf^T + R, expanded in scalars (cheaper than matmul on
    # 2x2s and identical to what the Pallas kernel computes).
    a, b = Hf[..., 0, 0], Hf[..., 0, 1]
    c, e = Hf[..., 1, 0], Hf[..., 1, 1]
    p00, p01 = Pf[..., 0, 0], Pf[..., 0, 1]
    p10, p11 = Pf[..., 1, 0], Pf[..., 1, 1]

    s00 = a * (p00 * a + p01 * b) + b * (p10 * a + p11 * b)
    s01 = a * (p00 * c + p01 * e) + b * (p10 * c + p11 * e)
    s10 = c * (p00 * a + p01 * b) + e * (p10 * a + p11 * b)
    s11 = c * (p00 * c + p01 * e) + e * (p10 * c + p11 * e)
    Sf = jnp.stack([
        jnp.stack([s00 + R[0, 0], s01 + R[0, 1]], axis=-1),
        jnp.stack([s10 + R[1, 0], s11 + R[1, 1]], axis=-1),
    ], axis=-2)

    return zp, Hv, Hf, Sf
