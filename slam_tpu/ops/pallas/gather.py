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
    - DMA the input window [C, chunk] HBM -> VMEM, DOUBLE-BUFFERED so
      chunk c+1 streams in while chunk c is consumed,
    - build the one-hot selection [chunk, B] from the block-local indices,
    - accumulate out_block += window @ one-hot on the MXU.

Exactness: the one-hot weights are exactly 1.0/0.0, so each output element
is a sum of exact (value * 1.0) products and exact zeros — bit-identical
to the XLA gather (asserted in tests/test_pallas.py). The matmuls run in
bfloat16 via an exact 3-way mantissa split (8+8+8 = 24 bits), ~2x the
rate of a HIGHEST-precision f32 contraction.

Zero-copy design (round 4): the kernel is MULTI-REF — it gathers a LIST
of [C_i, P] arrays in one pass (one one-hot per chunk, shared across
refs), so callers pass their state arrays directly (reshaped views)
instead of concatenating into one [C, P] matrix (a full extra state
copy). When P is LANE-aligned the last chunk's DMA window is CLAMPED
in-kernel (start = min(lo + c*chunk, P - chunk)) instead of padding the
input columns — the round-3 column pad materialized one more full state
copy per resample (~2.9 GB at 1M x 256 capacity, the proximate cause of
the config #5 capacity-256 OOM). Clamped windows can overlap the
previous chunk, so the one-hot additionally masks each index to the
chunk that OWNS it under the unclamped partition (each index claimed
exactly once).

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


def _dot(x, oh, out_dtype, transposed: bool):
    """x [C, chunk] contracted with oh — [chunk, B] (plain) or [B,
    chunk] (transposed one-hot; the MXU takes either orientation, so
    kernels can build the one-hot in whichever layout its operands
    arrive in without a relayout)."""
    dims = (((1,), (1,)), ((), ())) if transposed \
        else (((1,), (0,)), ((), ()))
    return jax.lax.dot_general(x, oh, dims,
                               preferred_element_type=out_dtype)


def _select(window, oh_bool, transposed: bool = False):
    """Exact one-hot selection [Ctot, chunk] @ [chunk, B] on the MXU:
    3-way bf16 mantissa split (8+8+8 = 24 bits), each product exact."""
    oh = oh_bool.astype(jnp.bfloat16)
    xa, xb, xc = _split3_bf16(window)
    return (_dot(xa, oh, jnp.float32, transposed)
            + _dot(xb, oh, jnp.float32, transposed)
            + _dot(xc, oh, jnp.float32, transposed))


def _select_int8(window, oh_bool, transposed: bool = False):
    """Exact one-hot selection via FOUR int8 matmuls (one per byte of
    the f32 bit pattern, int32 accumulation — 2x the bf16 MXU rate).
    Each output element is one selected signed byte + zeros, recombined
    bitwise; bit-identical to the f32 gather (including -0.0 — chunks
    combine by OR, so no float canonicalization ever happens)."""
    oh = oh_bool.astype(jnp.int8)
    ui = jax.lax.bitcast_convert_type(window, jnp.uint32)
    B = oh.shape[0] if transposed else oh.shape[1]
    word = jnp.zeros((window.shape[0], B), jnp.uint32)
    for b in range(4):
        byte = ((ui >> jnp.uint32(8 * b)) & jnp.uint32(0xFF)
                ).astype(jnp.uint8)
        plane = jax.lax.bitcast_convert_type(byte, jnp.int8)
        sel = _dot(plane, oh, jnp.int32, transposed)
        word = word | ((sel.astype(jnp.uint32) & jnp.uint32(0xFF))
                       << jnp.uint32(8 * b))
    return word


def _multi_gather_kernel(lo_ref, nch_ref, loc_ref, *refs,
                         chunk: int, Cs: tuple, B: int, Plim: int,
                         int8: bool):
    """refs = hbm inputs [n], outputs [n], window scratch, sem.

    All inputs share ONE (3, sum(C_i), chunk) window scratch (each ref
    DMAs into its row offset): the selection then runs as a SINGLE
    [Ctot, chunk] x [chunk, B] matmul per plane split — stacking the
    refs fills MXU row tiles that per-ref matmuls would waste (a 16-row
    ref alone uses 12.5% of its 128-row tile).

    Pipelining: grid programs are sequential on a TPU core, so program
    i issues the DMA for block i+1's first chunk before computing its
    own — the next window streams while this one is on the MXU. Chunk 0
    of block i lands in slot i % 2; the (rare) extra chunks of a block
    whose index window spans more than one chunk run serially through
    slot 2.
    """
    n = len(Cs)
    offs = [sum(Cs[:a]) for a in range(n)]
    Ctot = sum(Cs)
    hbm = refs[:n]
    outs = refs[n:2 * n]
    win = refs[2 * n]
    sem = refs[2 * n + 1]
    select = _select_int8 if int8 else _select

    blk = pl.program_id(0)
    nb = pl.num_programs(0)
    lo = lo_ref[blk]
    nch = nch_ref[blk]
    loc = loc_ref[0, :]                                   # [B] int32
    slot = jax.lax.rem(blk, 2)

    def copies(b_lo, c, s_idx):
        # Clamp the window into bounds instead of padding the input;
        # lo, chunk and Plim are all LANE-aligned so the min is too.
        s = pl.multiple_of(jnp.minimum(b_lo + c * chunk, Plim), LANE)
        return [pltpu.make_async_copy(
            hbm[a].at[:, pl.ds(s, chunk)],
            win.at[s_idx, pl.ds(offs[a], Cs[a])],
            sem.at[s_idx, a]) for a in range(n)]

    @pl.when(blk == 0)
    def _():
        for dma in copies(lo, 0, 0):
            dma.start()

    @pl.when(blk + 1 < nb)
    def _():
        for dma in copies(lo_ref[blk + 1], 0, jax.lax.rem(blk + 1, 2)):
            dma.start()

    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, B), 0)

    def onehot(c):
        # One-hot [chunk, B]: column b selects window row loc[b] - off,
        # but ONLY for indices this chunk owns under the unclamped
        # partition (clamped windows overlap their predecessor).
        off = pl.multiple_of(jnp.minimum(lo + c * chunk, Plim),
                             LANE) - lo
        own = (loc >= c * chunk) & (loc < (c + 1) * chunk)
        return (rows == (loc[None, :] - off)) & own[None, :]

    # Chunks combine by f32 add (bf16 splits) or bitwise OR (int8
    # byte planes) — each output element is claimed by exactly one
    # chunk, and OR avoids even the -0.0 + 0.0 canonicalization.
    combine = jnp.bitwise_or if int8 else jnp.add

    for dma in copies(lo, 0, slot):
        dma.wait()
    acc = select(win[slot], onehot(0))

    def extra(c, acc):
        for dma in copies(lo, c, 2):
            dma.start()
        oh = onehot(c)
        for dma in copies(lo, c, 2):
            dma.wait()
        return combine(acc, select(win[2], oh))

    acc = jax.lax.fori_loop(1, nch, extra, acc)
    if int8:
        acc = jax.lax.bitcast_convert_type(acc, jnp.float32)
    for a in range(n):
        outs[a][:, :] = acc[offs[a]:offs[a] + Cs[a], :]


def _row_pad(x):
    C = x.shape[0]
    C8 = -(-C // 8) * 8
    return jnp.pad(x, ((0, C8 - C), (0, 0))) if C8 != C else x


@functools.partial(jax.jit,
                   static_argnames=("block", "chunk", "interpret",
                                    "int8"))
def sorted_gather_multi(arrays, idx, block: int = 256, chunk: int = 512,
                        interpret: bool = False, int8: bool = True):
    """``[a[:, idx] for a in arrays]`` in ONE kernel pass for [C_i, P]
    f32 planes and (ideally sorted) int32 ``idx`` [N]. Bit-exact; fast
    when idx is non-decreasing. When P is a LANE multiple (and >= chunk)
    no input copy of any kind is made."""
    arrays = list(arrays)
    P = arrays[0].shape[1]
    assert all(a.shape[1] == P for a in arrays)
    C0s = tuple(a.shape[0] for a in arrays)
    arrays = [_row_pad(a) for a in arrays]
    Cs = tuple(a.shape[0] for a in arrays)

    N = idx.shape[0]
    B = block
    N_pad = -(-N // B) * B
    if N_pad != N:
        # Padded outputs gather from the last index (cheap, discarded).
        idx = jnp.concatenate(
            [idx, jnp.broadcast_to(idx[-1:], (N_pad - N,))])
    nb = N_pad // B

    if P % LANE == 0 and P >= chunk:
        Plim = P - chunk          # in-kernel clamp; no column pad
    else:
        P_pad = -(-P // LANE) * LANE + chunk
        arrays = [jnp.pad(a, ((0, 0), (0, P_pad - P))) for a in arrays]
        Plim = P_pad - chunk      # clamp never fires

    # Per-output-block window bounds (min/max, so unsorted idx is merely
    # slow, never wrong). lo is lane-aligned for DMA friendliness.
    blocks = idx.reshape(nb, B)
    lo = (blocks.min(axis=1) // LANE) * LANE              # [nb]
    hi = blocks.max(axis=1)
    nch = (hi - lo) // chunk + 1                          # [nb] >= 1
    loc = (blocks - lo[:, None]).reshape(1, N_pad).astype(jnp.int32)

    plane_out = [pl.BlockSpec((C, B), lambda i: (0, i),
                              memory_space=pltpu.VMEM) for C in Cs]
    outs = pl.pallas_call(
        functools.partial(_multi_gather_kernel, chunk=chunk, Cs=Cs,
                          B=B, Plim=Plim, int8=int8),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # lo
            pl.BlockSpec(memory_space=pltpu.SMEM),        # nch
            pl.BlockSpec((1, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),        # loc
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * len(arrays),
        out_specs=plane_out,
        out_shape=[jax.ShapeDtypeStruct((C, N_pad), jnp.float32)
                   for C in Cs],
        scratch_shapes=[pltpu.VMEM((3, sum(Cs), chunk), jnp.float32),
                        pltpu.SemaphoreType.DMA((3, len(arrays)))],
        interpret=interpret,
    )(lo.astype(jnp.int32), nch.astype(jnp.int32), loc, *arrays)
    return [o[:C0, :N] for o, C0 in zip(outs, C0s)]


def sorted_gather(flat, idx, block: int = 256, chunk: int = 512,
                  interpret: bool = False):
    """``flat[:, idx]`` for one [C, P] f32 plane matrix (see
    sorted_gather_multi)."""
    return sorted_gather_multi([flat], idx, block=block, chunk=chunk,
                               interpret=interpret)[0]


# ---------------------------------------------------------------------------
# Bounds-driven variant: gather ancestors straight from offspring bounds
# ---------------------------------------------------------------------------

def _bounds_gather_kernel(lo_ref, nch_ref, sm1_hbm, s_hbm, *refs,
                          chunk: int, Cs: tuple, B: int, Plim: int,
                          int8: bool):
    """Like _multi_gather_kernel, but the one-hot comes from the
    offspring-bound vectors instead of materialized ancestor indices:
    ancestor (window row) g owns output j iff Sm1[g] <= j < S[g]
    (slam_tpu.ops.resampling.offspring_bounds semantics). This removes
    the O(N) run-length decode (`ancestors_from_bounds`) from the
    resample path entirely — its scatter-max lowered to a serialized
    1-D scatter measured at ~11 ms for 1M particles."""
    n = len(Cs)
    offs = [sum(Cs[:a]) for a in range(n)]
    Ctot = sum(Cs)
    hbm = refs[:n]
    outs = refs[n:2 * n]
    win = refs[2 * n]
    sw_lo = refs[2 * n + 1]
    sw_hi = refs[2 * n + 2]
    sem = refs[2 * n + 3]
    ssem = refs[2 * n + 4]
    select = _select_int8 if int8 else _select

    blk = pl.program_id(0)
    nb = pl.num_programs(0)
    lo = lo_ref[blk]
    nch = nch_ref[blk]
    slot = jax.lax.rem(blk, 2)

    def copies(b_lo, c, s_idx):
        s = pl.multiple_of(jnp.minimum(b_lo + c * chunk, Plim), LANE)
        return ([pltpu.make_async_copy(
            hbm[a].at[:, pl.ds(s, chunk)],
            win.at[s_idx, pl.ds(offs[a], Cs[a])],
            sem.at[s_idx, a]) for a in range(n)]
            # S windows stay lane-major ([1, chunk]); the one-hot is
            # built TRANSPOSED (outputs on sublanes) and contracted
            # with an NT dot_general — no relayout anywhere.
            + [pltpu.make_async_copy(sm1_hbm.at[:, pl.ds(s, chunk)],
                                     sw_lo.at[s_idx],
                                     ssem.at[s_idx, 0]),
               pltpu.make_async_copy(s_hbm.at[:, pl.ds(s, chunk)],
                                     sw_hi.at[s_idx],
                                     ssem.at[s_idx, 1])])

    @pl.when(blk == 0)
    def _():
        for dma in copies(lo, 0, 0):
            dma.start()

    @pl.when(blk + 1 < nb)
    def _():
        for dma in copies(lo_ref[blk + 1], 0, jax.lax.rem(blk + 1, 2)):
            dma.start()

    rows = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    pos = blk * B + jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)

    def onehot_t(c, s_idx):
        # TRANSPOSED one-hot [B, chunk]: window lane r is ancestor
        # g = start + r; it owns output j iff Sm1[g] <= j < S[g].
        # `own` masks lanes to the chunk that owns them under the
        # unclamped partition (clamped windows overlap their
        # predecessor).
        off = pl.multiple_of(jnp.minimum(lo + c * chunk, Plim),
                             LANE) - lo
        own = ((rows + off >= c * chunk)
               & (rows + off < (c + 1) * chunk))
        return (sw_lo[s_idx] <= pos) & (pos < sw_hi[s_idx]) & own

    cur = copies(lo, 0, slot)
    for dma in cur:
        dma.wait()
    acc = select(win[slot], onehot_t(0, slot), transposed=True)
    combine = jnp.bitwise_or if int8 else jnp.add

    def extra(c, acc):
        for dma in copies(lo, c, 2):
            dma.start()
        for dma in copies(lo, c, 2):
            dma.wait()
        return combine(acc, select(win[2], onehot_t(c, 2),
                                   transposed=True))

    acc = jax.lax.fori_loop(1, nch, extra, acc)
    if int8:
        acc = jax.lax.bitcast_convert_type(acc, jnp.float32)
    for a in range(n):
        outs[a][:, :] = acc[offs[a]:offs[a] + Cs[a], :]


@functools.partial(jax.jit,
                   static_argnames=("block", "chunk", "interpret",
                                    "int8"))
def bounds_gather_multi(arrays, S, block: int = 256, chunk: int = 512,
                        interpret: bool = False, int8: bool = True):
    """Resample-ancestor gather driven DIRECTLY by offspring bounds
    ``S`` [P] (non-decreasing, S[-1] == P): returns
    ``[a[:, idx] for a in arrays]`` where ``idx`` is the ancestor
    vector S encodes — without ever materializing ``idx``. Per-block
    ancestor windows come from a searchsorted of the (static) block
    edges into S; bit-exact vs the materialized-index path."""
    arrays = list(arrays)
    P = arrays[0].shape[1]
    N = S.shape[0]                       # number of ancestors == P
    assert all(a.shape[1] == P for a in arrays) and N == P
    C0s = tuple(a.shape[0] for a in arrays)
    arrays = [_row_pad(a) for a in arrays]
    Cs = tuple(a.shape[0] for a in arrays)

    B = block
    assert P % B == 0, "resample keeps the particle count"
    nb = P // B

    S = S.astype(jnp.int32)
    Sm1 = jnp.concatenate([jnp.zeros((1,), jnp.int32), S[:-1]])

    if P % LANE == 0 and P >= chunk:
        Plim = P - chunk
        S2, Sm12 = S, Sm1
    else:
        P_pad = -(-P // LANE) * LANE + chunk
        arrays = [jnp.pad(a, ((0, 0), (0, P_pad - P))) for a in arrays]
        # Padded ancestors own no outputs: empty [P, P) intervals.
        S2 = jnp.pad(S, (0, P_pad - P), constant_values=P)
        Sm12 = jnp.pad(Sm1, (0, P_pad - P), constant_values=P)
        Plim = P_pad - chunk

    # First/last owning ancestor per output block: rank of the block
    # edges in S (idx_j = #{i : S_i <= j}).
    first = jnp.searchsorted(S, jnp.arange(nb, dtype=jnp.int32) * B,
                             side="right").astype(jnp.int32)
    last = jnp.searchsorted(S, jnp.arange(nb, dtype=jnp.int32) * B
                            + (B - 1), side="right").astype(jnp.int32)
    lo = (first // LANE) * LANE
    nch = (last - lo) // chunk + 1

    plane_out = [pl.BlockSpec((C, B), lambda i: (0, i),
                              memory_space=pltpu.VMEM) for C in Cs]
    outs = pl.pallas_call(
        functools.partial(_bounds_gather_kernel, chunk=chunk, Cs=Cs,
                          B=B, Plim=Plim, int8=int8),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # lo
            pl.BlockSpec(memory_space=pltpu.SMEM),        # nch
            pl.BlockSpec(memory_space=pl.ANY),         # Sm1
            pl.BlockSpec(memory_space=pl.ANY),         # S
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * len(arrays),
        out_specs=plane_out,
        out_shape=[jax.ShapeDtypeStruct((C, P), jnp.float32)
                   for C in Cs],
        scratch_shapes=[pltpu.VMEM((3, sum(Cs), chunk), jnp.float32),
                        pltpu.VMEM((3, 1, chunk), jnp.int32),
                        pltpu.VMEM((3, 1, chunk), jnp.int32),
                        pltpu.SemaphoreType.DMA((3, len(arrays))),
                        pltpu.SemaphoreType.DMA((3, 2))],
        interpret=interpret,
    )(lo, nch, Sm12.reshape(1, -1), S2.reshape(1, -1), *arrays)
    return [o[:C0, :] for o, C0 in zip(outs, C0s)]
