"""Pallas TPU kernels for the hot estimation ops.

The reference offloads its ``computeJacobians`` inner loop to a Vivado-HLS
FPGA accelerator (core.cpp:586-664; driven via AcceleratorHandler mmap of
Zynq OCM). These kernels are the TPU-native equivalent, designed for the
VPU rather than translated:

- particle axis on the 128-wide lane dimension, observation axis on
  sublanes: every quantity is a [K, P_block] f32 plane;
- ``jacobians_tpu``: the standalone batched Jacobian kernel (the direct
  analog of the FPGA contract — zp, Hv, Hf, Sf per particle x landmark);
- ``fs1_observe_tpu``: the fused FastSLAM observation kernel — Jacobians,
  innovation, Gaussian log-likelihood reduction AND the per-landmark 2x2
  EKF update in one VMEM-resident pass, which removes ~15 intermediate
  [P, K] planes of HBM traffic vs the unfused jnp path.
"""

from slam_tpu.ops.pallas.kernels import (
    fs1_observe_tpu,
    fs2_refine_tpu,
    jacobians_tpu,
)

__all__ = ["jacobians_tpu", "fs1_observe_tpu", "fs2_refine_tpu"]
