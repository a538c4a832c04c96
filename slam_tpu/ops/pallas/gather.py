"""Sorted-ancestor particle gather as a Pallas TPU kernel.

The resampling ancestor gather permutes the FULL particle state along the
lane axis: ``out[:, j] = state[:, idx[j]]``. XLA's lane-axis gather with
runtime indices reads scattered 4-byte elements against a 512-byte HBM
sector size — measured 45-180 ms for the [185, 1M] webmap state inside
the compiled run loop, ~25x off the HBM roofline. (Micro-benchmarks that
pass the indices as a compile-time constant lie about this: XLA
const-folds the permutation into fast static copies.) This kernel
exploits the structure the stratified resampler guarantees
(slam_tpu.ops.resampling: ancestors are NON-DECREASING, so each output
block of B lanes reads a narrow contiguous input window):

  grid over output blocks; per block
    - DMA the input window [C, chunk] HBM -> VMEM (sequential, full-rate),
    - build the one-hot selection [chunk, B] from the block-local indices,
    - accumulate out_block += window @ one-hot on the MXU.

Exactness: the one-hot weights are exactly 1.0/0.0, so each output element
is a sum of exact (value * 1.0) products and exact zeros — bit-identical
to the XLA gather (asserted in tests/test_pallas.py). The matmuls run in
bfloat16 via an exact 3-way mantissa split (8+8+8 = 24 bits), ~2x the
rate of a HIGHEST-precision f32 contraction.

The window-bound scalars are computed with per-block min/max (not the
sorted endpoints), so the kernel is CORRECT for arbitrary indices — an
unsorted input only costs more chunk iterations.

This is the TPU-native replacement for the reference's particle
copy-and-keep loop (resampleParticles, core.cpp:736-748).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _split3_bf16(x):
    """Exact 3-way bfloat16 split of an f32 array: returns (a, b, c) in
    bf16 with a + b + c == x exactly (truncation split of the 24-bit
    mantissa into 8+8+8; each part is exactly bf16-representable)."""
    ui = jax.lax.bitcast_convert_type(x, jnp.uint32)
    a = jax.lax.bitcast_convert_type(ui & jnp.uint32(0xFFFF0000),
                                     jnp.float32)
    r = x - a
    ui = jax.lax.bitcast_convert_type(r, jnp.uint32)
    b = jax.lax.bitcast_convert_type(ui & jnp.uint32(0xFFFF0000),
                                     jnp.float32)
    c = r - b
    return (a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            c.astype(jnp.bfloat16))


def _gather_kernel(lo_ref, nch_ref, loc_ref, x_hbm, o_ref, scratch, sem,
                   *, chunk: int, C: int, B: int):
    blk = pl.program_id(0)
    lo = lo_ref[blk]
    nch = nch_ref[blk]
    loc = loc_ref[0, :]                                   # [B] int32

    def body(c, acc):
        # lo is pre-aligned to LANE and chunk is a LANE multiple; tell
        # Mosaic so the HBM slice is provably tile-aligned.
        start = pl.multiple_of(lo + c * chunk, LANE)
        dma = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(start, chunk)], scratch, sem)
        dma.start()
        # One-hot [chunk, B]: column b selects window row loc[b] - c*chunk.
        rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, B), 0)
        oh = (rows == (loc[None, :] - c * chunk)).astype(jnp.bfloat16)
        dma.wait()
        xa, xb, xc = _split3_bf16(scratch[:, :])
        sel = (jnp.dot(xa, oh, preferred_element_type=jnp.float32)
               + jnp.dot(xb, oh, preferred_element_type=jnp.float32)
               + jnp.dot(xc, oh, preferred_element_type=jnp.float32))
        return acc + sel

    o_ref[:, :] = jax.lax.fori_loop(
        0, nch, body, jnp.zeros((C, B), jnp.float32))


@functools.partial(jax.jit,
                   static_argnames=("block", "chunk", "interpret"))
def sorted_gather(flat, idx, block: int = 512, chunk: int = 512,
                  interpret: bool = False):
    """``flat[:, idx]`` for [C, P] f32 planes and (ideally sorted) int32
    ``idx`` [N]. Bit-exact; fast when idx is non-decreasing."""
    C0, P = flat.shape
    # DMA slices along the row (sublane) axis must be 8-aligned.
    C = -(-C0 // 8) * 8
    if C != C0:
        flat = jnp.pad(flat, ((0, C - C0), (0, 0)))
    N = idx.shape[0]
    B = block
    N_pad = -(-N // B) * B
    if N_pad != N:
        # Padded outputs gather from the last index (cheap, discarded).
        idx = jnp.concatenate(
            [idx, jnp.broadcast_to(idx[-1:], (N_pad - N,))])
    nb = N_pad // B

    # Per-output-block window bounds (min/max, so unsorted idx is merely
    # slow, never wrong). lo is lane-aligned for DMA friendliness.
    blocks = idx.reshape(nb, B)
    lo = (blocks.min(axis=1) // LANE) * LANE              # [nb]
    hi = blocks.max(axis=1)
    nch = (hi - lo) // chunk + 1                          # [nb] >= 1
    loc = (blocks - lo[:, None]).reshape(1, N_pad).astype(jnp.int32)

    # Pad the input columns so the last chunk DMA never runs off the end.
    P_pad = -(-P // LANE) * LANE + chunk
    flat_p = jnp.pad(flat, ((0, 0), (0, P_pad - P)))

    out = pl.pallas_call(
        functools.partial(_gather_kernel, chunk=chunk, C=C, B=B),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # lo
            pl.BlockSpec(memory_space=pltpu.SMEM),        # nch
            pl.BlockSpec((1, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),        # loc
            pl.BlockSpec(memory_space=pltpu.ANY),         # flat (HBM)
        ],
        out_specs=pl.BlockSpec((C, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, N_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C, chunk), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(lo.astype(jnp.int32), nch.astype(jnp.int32), loc, flat_p)
    return out[:C0, :N]
