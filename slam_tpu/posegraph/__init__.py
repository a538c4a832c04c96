"""Pose-graph refinement: batch Gauss-Newton bundle adjustment with
Schur-complement landmark elimination.

No reference counterpart (the reference is a pure filter); required by
the large-scale benchmark configs (BASELINE.md: distributed pose-graph BA
over stored keyframes at the 10k-landmark scale).
"""

from slam_tpu.posegraph.ba import (
    BAProblem,
    problem_from_run,
    solve_ba,
    solve_ba_device,
)

__all__ = ["BAProblem", "problem_from_run", "solve_ba",
           "solve_ba_device"]

from slam_tpu.posegraph.distributed import solve_ba_sharded  # noqa: E402

__all__.append("solve_ba_sharded")
