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

_VMEM_LIMIT_BYTES = 96 * 1024 * 1024


def _compiler_params(interpret: bool):
    """Raise Mosaic's 16 MB default scoped-VMEM limit: a full window
    group (~24 MB budget) plus double-buffered grid I/O legitimately
    exceeds it."""
    if interpret:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES)



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

    All inputs share ONE (4, sum(C_i), chunk) window scratch (each ref
    DMAs into its row offset): the selection then runs as a SINGLE
    [Ctot, chunk] x [chunk, B] matmul per plane split — stacking the
    refs fills MXU row tiles that per-ref matmuls would waste (a 16-row
    ref alone uses 12.5% of its 128-row tile).

    Pipelining: grid programs are sequential on a TPU core, so program
    i issues the DMA for block i+1's first chunk before computing its
    own — the next window streams while this one is on the MXU. Chunk 0
    of block i lands in slot i % 2; the extra chunks of a block whose
    index window spans more than one chunk ping-pong slots 2/3 with
    the same start-ahead pattern. (A single serial extra slot is NOT
    safe: the scalar core runs ahead of the vector pipeline, so the
    next chunk's DMA start can overwrite the window while the previous
    chunk's vector reads are still in flight — observed as ~1e-5 of
    gathered elements corrupted at 1M lanes on real hardware, with
    interpret mode clean.)
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

    @pl.when(nch > 1)
    def _():
        for dma in copies(lo, 1, 2):
            dma.start()

    def extra(c, acc):
        s_c = 2 + jax.lax.rem(c - 1, 2)

        @pl.when(c + 1 < nch)
        def _():
            for dma in copies(lo, c + 1, 2 + jax.lax.rem(c, 2)):
                dma.start()

        oh = onehot(c)
        for dma in copies(lo, c, s_c):
            dma.wait()
        return combine(acc, select(win[s_c], oh))

    acc = jax.lax.fori_loop(1, nch, extra, acc)
    if int8:
        acc = jax.lax.bitcast_convert_type(acc, jnp.float32)
    for a in range(n):
        outs[a][:, :] = acc[offs[a]:offs[a] + Cs[a], :]


def _row_pad(x):
    C = x.shape[0]
    C8 = -(-C // 8) * 8
    return jnp.pad(x, ((0, C8 - C), (0, 0))) if C8 != C else x


# One kernel call's 3-slot VMEM window budget; row sets larger than
# this are partitioned across calls (see _grouped_call).
_WINDOW_BUDGET_BYTES = 24 * 1024 * 1024


def _max_window_rows(chunk: int) -> int:
    return max(8, (_WINDOW_BUDGET_BYTES // (4 * chunk * 4)) // 8 * 8)


def _grouped_call(arrays, chunk, call):
    """Dispatch ``call(group_arrays) -> group_outs`` so every kernel
    call's combined row count fits the window budget: whole arrays are
    packed greedily; an oversized single array is row-sliced (its
    pieces are re-concatenated — the 10k-capacity landmark planes at
    5L = 50k rows are the motivating case)."""
    arrays = list(arrays)
    max_rows = _max_window_rows(chunk)
    pieces = []                                  # (orig index, piece)
    for i, a in enumerate(arrays):
        C = a.shape[0]
        if C <= max_rows:
            pieces.append((i, a))
        else:
            for r0 in range(0, C, max_rows):
                pieces.append((i, jax.lax.slice_in_dim(
                    a, r0, min(r0 + max_rows, C), axis=0)))
    groups, cur, rows = [], [], 0
    for item in pieces:
        c8 = -(-item[1].shape[0] // 8) * 8
        if cur and rows + c8 > max_rows:
            groups.append(cur)
            cur, rows = [], 0
        cur.append(item)
        rows += c8
    if cur:
        groups.append(cur)

    if len(groups) == 1 and len(pieces) == len(arrays):
        return call(arrays)
    parts = [[] for _ in arrays]
    for g in groups:
        outs = call([p for _, p in g])
        for (i, _), o in zip(g, outs):
            parts[i].append(o)
    return [ps[0] if len(ps) == 1 else jnp.concatenate(ps, axis=0)
            for ps in parts]


def sorted_gather_multi(arrays, idx, block: int = 256, chunk: int = 512,
                        interpret: bool = False, int8: bool = True):
    """``[a[:, idx] for a in arrays]`` in one kernel pass (or several,
    for row sets beyond the VMEM window budget) for [C_i, P] f32
    planes and (ideally sorted) int32 ``idx`` [N]. Bit-exact; fast
    when idx is non-decreasing. When P is a LANE multiple (and >=
    chunk) no input copy of any kind is made."""
    return _grouped_call(
        arrays, chunk,
        lambda group: _sorted_gather_impl(group, idx, block=block,
                                          chunk=chunk,
                                          interpret=interpret,
                                          int8=int8))


@functools.partial(jax.jit,
                   static_argnames=("block", "chunk", "interpret",
                                    "int8"))
def _sorted_gather_impl(arrays, idx, block: int = 256, chunk: int = 512,
                        interpret: bool = False, int8: bool = True):
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
        scratch_shapes=[pltpu.VMEM((4, sum(Cs), chunk), jnp.float32),
                        pltpu.SemaphoreType.DMA((4, len(arrays)))],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
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

def _bounds_gather_kernel(lo_ref, nch_ref, *refs,
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
    sem = refs[2 * n + 1]
    select = _select_int8 if int8 else _select

    blk = pl.program_id(0)
    nb = pl.num_programs(0)
    lo = lo_ref[blk]
    nch = nch_ref[blk]
    slot = jax.lax.rem(blk, 2)

    # The Sm1/S bound vectors ride INSIDE the data window (the wrapper
    # prepends them as two bitcast rows), so they share the data DMAs'
    # lifetime exactly. A first cut gave them their own tiny scratch:
    # those 2 KB DMAs complete almost instantly, so the cross-block
    # prefetch overwrote a slot the previous block's vector reads had
    # not yet drained (scalar runahead) — observed as whole output
    # columns summing TWO ancestors at 1M lanes, interpret mode clean.
    def copies(b_lo, c, s_idx):
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
        sm1 = jax.lax.bitcast_convert_type(win[s_idx, 0:1, :],
                                           jnp.int32)
        s_hi = jax.lax.bitcast_convert_type(win[s_idx, 8:9, :],
                                            jnp.int32)
        return (sm1 <= pos) & (pos < s_hi) & own

    cur = copies(lo, 0, slot)
    for dma in cur:
        dma.wait()
    acc = select(win[slot], onehot_t(0, slot), transposed=True)
    combine = jnp.bitwise_or if int8 else jnp.add

    @pl.when(nch > 1)
    def _():
        for dma in copies(lo, 1, 2):
            dma.start()

    def extra(c, acc):
        s_c = 2 + jax.lax.rem(c - 1, 2)

        @pl.when(c + 1 < nch)
        def _():
            for dma in copies(lo, c + 1, 2 + jax.lax.rem(c, 2)):
                dma.start()

        for dma in copies(lo, c, s_c):
            dma.wait()
        return combine(acc, select(win[s_c], onehot_t(c, s_c),
                                   transposed=True))

    acc = jax.lax.fori_loop(1, nch, extra, acc)
    if int8:
        acc = jax.lax.bitcast_convert_type(acc, jnp.float32)
    for a in range(n):
        outs[a][:, :] = acc[offs[a]:offs[a] + Cs[a], :]


def bounds_gather_multi(arrays, S, block: int = 512, chunk: int = 768,
                        interpret: bool = False, int8: bool = True):
    """Resample-ancestor gather driven DIRECTLY by offspring bounds
    ``S`` [P] (non-decreasing, S[-1] == P): returns
    ``[a[:, idx] for a in arrays]`` where ``idx`` is the ancestor
    vector S encodes — without ever materializing ``idx``. Per-block
    ancestor windows come from a searchsorted of the (static) block
    edges into S; bit-exact vs the materialized-index path. Row sets
    beyond the VMEM window budget are partitioned across calls."""
    return _grouped_call(
        arrays, chunk,
        lambda group: _bounds_gather_impl(group, S, block=block,
                                          chunk=chunk,
                                          interpret=interpret,
                                          int8=int8))


@functools.partial(jax.jit,
                   static_argnames=("block", "chunk", "interpret",
                                    "int8"))
def _bounds_gather_impl(arrays, S, block: int = 512, chunk: int = 768,
                        interpret: bool = False, int8: bool = True):
    arrays = list(arrays)
    P = arrays[0].shape[1]
    N = S.shape[0]                       # number of ancestors == P
    assert all(a.shape[1] == P for a in arrays) and N == P
    C0s = tuple(a.shape[0] for a in arrays)

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

    # Prepend the bound vectors (bitcast, one row each) so they ride
    # the data-window DMA; their "gathered" outputs are discarded.
    arrays = ([jax.lax.bitcast_convert_type(
                   Sm12, jnp.float32).reshape(1, -1),
               jax.lax.bitcast_convert_type(
                   S2, jnp.float32).reshape(1, -1)] + arrays)
    arrays = [_row_pad(a) for a in arrays]
    Cs = tuple(a.shape[0] for a in arrays)

    # First/last owning ancestor per output block: CONSERVATIVE rank
    # bounds of the block edges in S from a stride-subsampled all-pairs
    # comparison (exact-rank jnp.searchsorted costs ~0.7 ms/call at 1M
    # in ~20 serialized gather rounds; a window that starts early/ends
    # late is correct — the offspring-bound one-hot claims nothing
    # outside the true [first, last]).
    N2 = S2.shape[0]
    stride = LANE
    sub = S2[stride - 1::stride] if N2 % stride == 0 else None
    edges = jnp.arange(nb, dtype=jnp.int32) * B
    if sub is not None:
        first = jnp.sum((sub[None, :] <= edges[:, None]
                         ).astype(jnp.int32), axis=1) * stride
        last = jnp.minimum(
            jnp.sum((sub[None, :] <= edges[:, None] + (B - 1)
                     ).astype(jnp.int32), axis=1) * stride
            + (stride - 1), N2 - 1)
    else:
        first = jnp.searchsorted(S2, edges,
                                 side="right").astype(jnp.int32)
        last = jnp.searchsorted(S2, edges + (B - 1),
                                side="right").astype(jnp.int32)
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
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * len(arrays),
        out_specs=plane_out,
        out_shape=[jax.ShapeDtypeStruct((C, P), jnp.float32)
                   for C in Cs],
        scratch_shapes=[pltpu.VMEM((4, sum(Cs), chunk), jnp.float32),
                        pltpu.SemaphoreType.DMA((4, len(arrays)))],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(lo, nch, *arrays)
    return [o[:C0, :]
            for o, C0 in zip(outs[2:], C0s)]
