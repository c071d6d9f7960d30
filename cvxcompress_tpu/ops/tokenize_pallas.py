"""Pallas TPU kernel for the tokenize pass (PASS 1 of the entropy encoder).

The XLA formulation of tokenize (rle_device.tokenize_desc) tops out at
~4 GC/s — it spans ~10 materialized passes over HBM that XLA refuses to
fuse (classification, group-of-8 mode votes, run cummax hierarchy, cost
selects, descriptor packing).  This kernel does the whole thing in ONE
VMEM-resident pass: read a tile of scaled coefficients, write its int32
descriptors and per-chunk byte counts.  Traffic = read 4B + write 4B per
cell, the roofline for this stage.

Key design points:

  * input is PRE-SCALED (fv = mulfac * coeff, computed for free inside the
    wavelet stage's epilogue) so the kernel needs no per-block metadata;
  * zero-run detection needs a scan over the whole volume in cell order:
    within a tile it is a lane-wise + sublane-wise cummax of "last
    nonzero global index"; across sequential grid steps the carry lives
    in SMEM scratch (TPU grid iteration is sequential).  Per-block run
    resets need no segmented scan: the within-block last-nonzero is just
    max(lastnm_global, block_base - 1) — earlier-block indices clamp away;
  * run ends need ONE cell of lookahead: a second (8, 128) window
    BlockSpec on the same input delivers the next tile's first row;
  * grammar, guards and descriptor layout are bit-compatible with
    rle_device.tokenize_desc (tested against it and the NumPy oracle).

Reference grammar: Run_Length_Encode_Slow.cpp:189-294,
Run_Length_Escape_Codes.hxx:8-14.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
INT32_MIN = -2147483648
MAX_RUN24 = (1 << 24) - 1

LANES = 128  # cells per chunk row == chunk size
TR = 1024  # chunk rows per grid step (1024x128 f32 tile = 512 KiB VMEM)


def _cumscan_max(x, axis, idx, fill):
    """Inclusive max-scan along `axis` via log2(length) roll+mask steps.

    lax.cummax has no Pallas TPU lowering, and Mosaic rejects the
    concat-with-offset shifts — pltpu.roll + an index mask do the job.
    `idx` is the broadcasted iota along `axis`.
    """
    length = x.shape[axis]
    s = 1
    while s < length:
        sh = jnp.where(idx >= s, pltpu.roll(x, s, axis), fill)
        x = jnp.maximum(x, sh)
        s *= 2
    return x


def _shr_lanes(x, s, lane, fill):
    """out[:, l] = x[:, l+s] (bring from higher lanes), fill at the end."""
    return jnp.where(lane < LANES - s, pltpu.roll(x, LANES - s, 1), fill)


def _shl_lanes(x, s, lane, fill):
    """out[:, l] = x[:, l-s] (bring from lower lanes), fill at the start."""
    return jnp.where(lane >= s, pltpu.roll(x, s, 1), fill)


import os as _os

# One-hot MXU group ops in the tokenize bodies — DEFAULT since the
# round-3 on-chip A/B (384^3 fused compress 6.7 ms vs 8.6 with the
# roll-chain formulation); CVX_TD_MXU=0 restores the rolls.
_TD_MXU = _os.environ.get("CVX_TD_MXU", "1") == "1"

# Hierarchical zero-run lane scan (3 within-8 rolls + one-hot MXU
# extract -> narrow 16-group scan -> spread) replacing the 7-step
# full-width cummax; opt-in pending the on-chip A/B.
_TD_HIER = _os.environ.get("CVX_TD_HIER", "0") == "1"



def mxu_dot3(a, b, split):
    """Float matmul inside a Pallas kernel at ~Precision.HIGH cost.

    Mosaic lowers only DEFAULT (one bf16 pass — too lossy for the
    transform contract) and HIGHEST (six passes).  With `split` True
    this emulates XLA's HIGH (bf16_3x) manually: split each operand
    into bf16 hi+lo and sum the three significant cross products —
    three MXU passes, ~2^-16 relative accuracy, exact for integers
    below 2^16.  `split` must be False under interpret mode (CPU
    executes the bf16 casts for real, breaking byte-parity fixtures
    that expect full-f32 staged results) and for int payloads >= 2^16.
    """
    if not split:
        return jnp.dot(
            a, b, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (
        jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
        + jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
        + jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
    )


def _tile_desc(fv, nxt_vals, carry_in, i, ncpb):
    """Shared tile computation: (desc, cost, carry_out) for one tile.

    The tile row count is taken from `fv` (the chunk kernels pass
    (TR, 128); the whole-block 128^3 kernel passes (cells//128, 128)).
    `i` indexes tiles of that size for the global cell index."""
    TR = fv.shape[0]

    # --- quantize with AVX cvttps semantics (Run_Length_Encode_Slow.cpp:203)
    in_range = (fv >= jnp.float32(-2147483648.0)) & (
        fv < jnp.float32(2147483648.0)
    )
    tr = jnp.trunc(jnp.where(in_range, fv, 0.0))
    iv = jnp.where(in_range, tr.astype(I32), I32(INT32_MIN))

    # --- size classes (nested; zero lanes count as byte, ref :215)
    izero = iv == 0
    is_byte = (iv > -125) & (iv < 125)
    is_short = (iv >= -32768) & (iv <= 32767)
    is_i3 = (iv >= -8388608) & (iv <= 8388607)

    # --- group-of-8 fast-path modes (guards: ref :216,:231,:246)
    # group sums via lane-shift windowed adds (Mosaic has no in-kernel
    # 3D reshape); counts land base-16-packed at each group's lane 0
    code = (
        izero.astype(I32)
        + (is_byte.astype(I32) << 4)
        + (is_short.astype(I32) << 8)
        + (is_i3.astype(I32) << 12)
    )
    rows = jax.lax.broadcasted_iota(I32, (TR, LANES), 0)
    lane = jax.lax.broadcasted_iota(I32, (TR, LANES), 1)
    if _TD_MXU:
        # group-of-8 sums + group broadcast as ONE one-hot MXU dot: G8 is
        # the (128, 128) same-group indicator, so code @ G8 lands every
        # group's field sums on EVERY lane of the group (packed values
        # <= 0x8888 are exact in f32 at precision=HIGHEST), replacing
        # the 3-step shr-sum chain AND the 3-step mode shl-broadcast.
        li = jax.lax.broadcasted_iota(I32, (LANES, LANES), 0)
        lj = jax.lax.broadcasted_iota(I32, (LANES, LANES), 1)
        g8 = ((li // 8) == (lj // 8)).astype(jnp.float32)
        y = jnp.dot(
            code.astype(jnp.float32), g8,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(I32)
    else:
        y = code
        for s in (1, 2, 4):
            y = y + _shr_lanes(y, s, lane, I32(0))  # sum code[:, l..l+7]
    nzero = y & 15
    nb = (y >> 4) & 15
    ns = (y >> 8) & 15
    n3 = (y >> 12) & 15
    nozero = nzero == 0
    allbyte = nozero & (nb == 8)
    allshort = nozero & ~allbyte & (ns == 8) & (nb + (8 - nb) * 3 > 17)
    alli3 = (
        nozero & ~allbyte & ~allshort & (n3 == 8)
        & (nb + (ns - nb) * 3 + (8 - ns) * 4 > 25)
    )
    mode = jnp.where(allbyte, 1, jnp.where(allshort, 2, jnp.where(alli3, 3, 0)))
    if not _TD_MXU:
        # group sums valid only at lane 0 of each group: mask and
        # OR-propagate across it
        mode = jnp.where(lane % 8 == 0, mode, 0)
        for s in (1, 2, 4):
            mode = mode | _shl_lanes(mode, s, lane, I32(0))

    # --- zero-run structure
    gidx = (i * TR + rows) * LANES + lane  # global cell index
    member = izero

    if _TD_HIER:
        # lane-LOCAL last-nonmember scan (values in [-1, 127], exact in
        # f32): 3 within-8 roll steps, then the 16 group maxima cross-
        # scan on a narrow (TR, 16) column via one-hot extract/spread
        # MXU dots — 4 full-width ops fewer than the flat 7-step cummax.
        ls = jnp.where(member, I32(-1), lane)
        l8s = lane % 8
        for s in (1, 2, 4):
            ls = jnp.maximum(
                ls, jnp.where(l8s >= s, pltpu.roll(ls, s, 1), I32(-1))
            )
        ei = jax.lax.broadcasted_iota(I32, (LANES, 16), 0)
        ej = jax.lax.broadcasted_iota(I32, (LANES, 16), 1)
        exm = (ei == ej * 8 + 7).astype(jnp.float32)  # group-last picker
        gmax = jnp.dot(
            ls.astype(jnp.float32), exm,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (TR, 16)
        gi16 = jax.lax.broadcasted_iota(I32, (TR, 16), 1)
        gsc = _cumscan_max(gmax, 1, gi16, jnp.float32(-1.0))
        gprev = jnp.where(
            gi16 == 0, jnp.float32(-1.0), pltpu.roll(gsc, 1, 1)
        )
        si = jax.lax.broadcasted_iota(I32, (16, LANES), 0)
        sj = jax.lax.broadcasted_iota(I32, (16, LANES), 1)
        spm = (si == sj // 8).astype(jnp.float32)
        prev_l = jnp.dot(
            gprev, spm, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(I32)
        ls = jnp.maximum(ls, prev_l)
        lnm = jnp.where(
            ls >= 0, (i * TR + rows) * LANES + ls, I32(-1)
        )
    else:
        lnm = jnp.where(member, I32(-1), gidx)
        lnm = _cumscan_max(lnm, 1, lane, I32(-1))  # within row (lane order)
    rowmax = jnp.max(lnm, axis=1, keepdims=True)  # (TR, 1)
    rows1 = jax.lax.broadcasted_iota(I32, (TR, 1), 0)
    rowcarry = _cumscan_max(rowmax, 0, rows1, I32(-1))  # narrow row scan
    prev_rows = jnp.where(rows1 == 0, I32(-1), pltpu.roll(rowcarry, 1, 0))
    lastnm_glob = jnp.maximum(lnm, jnp.maximum(prev_rows, carry_in))
    carry_out = jnp.maximum(carry_in, jnp.max(lnm))

    cells_per_block = ncpb * LANES
    block_base = (gidx // cells_per_block) * cells_per_block
    lastnm = jnp.maximum(lastnm_glob, block_base - 1)
    run_len = gidx - lastnm

    # next cell's membership (one-cell lookahead, row-major order);
    # membership == quantizes-to-zero == fv in (-1, 1) (NaN excluded).
    # Rolls only (Mosaic rejects offset concats): within-row shift for
    # lanes < 127; for lane 127 the next row's lane 0 (rolled into place);
    # for the tile's last cell the first value of the NEXT tile.
    mem_i = member.astype(I32)
    a = pltpu.roll(mem_i, LANES - 1, 1)  # [r, l] <- member[r, l+1] (l<127)
    b = pltpu.roll(mem_i, TR - 1, 0)  # [r, :] <- member[r+1, :] (r<TR-1)
    c = pltpu.roll(b, 127, 1)     # [r, 127] <- member[r+1, 0]
    # scalar fv of the next tile's first cell, extracted from the (8, 128)
    # lookahead window by a masked sum (NaN propagates -> not a member)
    r8 = jax.lax.broadcasted_iota(I32, (8, LANES), 0)
    l8 = jax.lax.broadcasted_iota(I32, (8, LANES), 1)
    nxt0 = jnp.sum(jnp.where((r8 == 0) & (l8 == 0), nxt_vals, 0.0))
    nxt0_member = (nxt0 > -1.0) & (nxt0 < 1.0)
    nxt_member = jnp.where(
        lane < LANES - 1, a,
        jnp.where(rows < TR - 1, c, nxt0_member.astype(I32)),
    ) != 0
    block_end = (gidx + 1) % cells_per_block == 0
    run_end = member & (block_end | ~nxt_member)

    # --- per-cell emission cost (bytes)
    lane0 = lane % 8 == 0
    cb_ = is_byte & ~izero
    cs_ = is_short & ~is_byte
    c3_ = is_i3 & ~is_short
    runcost = jnp.where(
        run_len == 1, 1,
        jnp.where(run_len < 256, 2, jnp.where(run_len <= MAX_RUN24, 4, 5)),
    )
    cost = jnp.where(
        mode == 1, 1,
        jnp.where(
            mode == 2, jnp.where(lane0, 3, 2),
            jnp.where(
                mode == 3, jnp.where(lane0, 4, 3),
                jnp.where(
                    izero, jnp.where(run_end, runcost, 0),
                    jnp.where(cb_, 1, jnp.where(cs_, 3, jnp.where(c3_, 4, 5))),
                ),
            ),
        ),
    ).astype(I32)

    desc = (
        cost
        | (run_end.astype(I32) << 3)
        | (jnp.minimum(run_len, MAX_RUN24) << 4)
    )
    return desc, cost, carry_out


def _kernel(fv_ref, nxt_ref, desc_ref, carry_ref, *, ncpb):
    """One (TR, 128) tile: per-cell int32 descriptors (dense output)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[0] = -1

    desc, _cost, carry_out = _tile_desc(
        fv_ref[:], nxt_ref[0:8, :], carry_ref[0], i, ncpb
    )
    carry_ref[0] = carry_out
    desc_ref[:] = desc


def _cumscan_add(x, idx, fill):
    """Inclusive sum-scan along axis 0 via roll+mask steps ((TR,1) cols)."""
    length = x.shape[0]
    s = 1
    while s < length:
        x = x + jnp.where(idx >= s, pltpu.roll(x, s, 0), fill)
        s *= 2
    return x


def _kernel_compact(fv_ref, nxt_ref, cb_ref, fvc_ref, dscc_ref, metac_ref,
                    carry_ref, fvs, dss, mts, sem, *, ncpb):
    """Tokenize + within-tile row compaction + append-DMA of active chunks.

    Emits, per tile: dense per-chunk byte counts (cb_ref) and the tile's
    ACTIVE chunk rows (scaled coeffs, descriptors, [chunk-id, bytes] meta)
    appended at a running row offset in the ANY-space outputs.  Each
    tile's contribution is padded to a multiple of 8 rows (DMA slices
    must stay sublane-tile aligned); pad rows carry meta bytes = 0 and
    are skipped downstream.  The next tile overwrites this tile's padding
    garbage beyond its padded length — the grid is sequential, so the
    overlapping writes are ordered.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[0] = -1  # zero-run carry (last nonzero global index)
        carry_ref[1] = 0  # output row cursor

    desc, cost, carry_out = _tile_desc(
        fv_ref[:], nxt_ref[0:8, :], carry_ref[0], i, ncpb
    )
    carry_ref[0] = carry_out

    cb = cost.sum(axis=1, keepdims=True)  # (TR, 1)
    cb_ref[:] = cb

    rows1 = jax.lax.broadcasted_iota(I32, (TR, 1), 0)
    live = (cb > 0).astype(I32)
    incl = _cumscan_add(live, rows1, I32(0))
    k = jnp.max(incl)  # live rows in this tile
    dist = jnp.where(live > 0, rows1 - (incl - 1), I32(-1))

    fvt = fv_ref[:]
    lane128 = jax.lax.broadcasted_iota(I32, (TR, LANES), 1)
    meta = jnp.where(
        lane128 == 0, i * TR + rows1, jnp.where(lane128 == 1, cb, 0)
    )
    dsct = desc
    s = 1
    while s < TR:
        # front-pack: row p receives from row p+s (roll by TR-s, masked)
        inc_d = jnp.where(
            rows1 < TR - s, pltpu.roll(dist, TR - s, 0), I32(-1)
        )
        take = (inc_d >= 0) & ((inc_d & s) != 0)
        moveout = (dist >= 0) & ((dist & s) != 0)
        fvt = jnp.where(take, pltpu.roll(fvt, TR - s, 0), fvt)
        dsct = jnp.where(take, pltpu.roll(dsct, TR - s, 0), dsct)
        meta = jnp.where(take, pltpu.roll(meta, TR - s, 0), meta)
        dist = jnp.where(take, inc_d - s, jnp.where(moveout, I32(-1), dist))
        s *= 2

    # rows beyond the live count are stale copies: mark dead (bytes = 0)
    meta = jnp.where((rows1 < k) | (lane128 == 0), meta, 0)

    fvs[:] = fvt
    dss[:] = dsct
    mts[:] = meta
    cursor = carry_ref[1]
    d1 = pltpu.make_async_copy(fvs, fvc_ref.at[pl.ds(cursor, TR), :], sem)
    d1.start()
    d1.wait()
    d2 = pltpu.make_async_copy(dss, dscc_ref.at[pl.ds(cursor, TR), :], sem)
    d2.start()
    d2.wait()
    d3 = pltpu.make_async_copy(mts, metac_ref.at[pl.ds(cursor, TR), :], sem)
    d3.start()
    d3.wait()
    carry_ref[1] = cursor + ((k + 7) // 8) * 8


@functools.partial(jax.jit, static_argnames=("ncpb", "interpret"))
def tokenize_tiles(fv_chunks, ncpb, interpret=False):
    """Run the kernel over (nchunks_pad, 128) scaled coefficients.

    nchunks_pad must be a multiple of TR plus 8 trailing pad rows (the
    lookahead window).  Returns desc (nchunks_pad-8, 128) i32; pad chunks
    produce garbage that the caller slices off.
    """
    npad1, lanes = fv_chunks.shape
    assert lanes == LANES and (npad1 - 8) % TR == 0
    ntiles = (npad1 - 8) // TR

    desc = pl.pallas_call(
        functools.partial(_kernel, ncpb=ncpb),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((TR, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # lookahead window starting at the next tile's first row
            # (trailing pad rows guarantee it is always in range); only
            # row 0 is read.  8 rows: TPU block shapes need sublane
            # multiples of 8.
            pl.BlockSpec((8, LANES), lambda i: ((i + 1) * TR // 8, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad1 - 8, LANES), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(fv_chunks, fv_chunks)
    return desc


def pad_rows(nchunks):
    """Padded row count: next multiple of TR, plus the lookahead rows."""
    return -(-nchunks // TR) * TR + 8


def pad_rows2(nchunks):
    """Padded row count for the clamped-lookahead kernel: TR multiple only
    (no +8 tail; when nchunks is already a multiple the producer's pad
    CONCAT — a full extra copy of the coefficients — disappears)."""
    return -(-nchunks // TR) * TR


@functools.partial(jax.jit, static_argnames=("ncpb", "interpret"))
def tokenize_tiles2(fv_chunks, ncpb, interpret=False):
    """Clamped-lookahead kernel over (k*TR, 128) rows -> desc.

    No +8 lookahead tail rows: the last tile's window clamps to the array
    tail, whose value never matters (the final cell of the final tile is
    a block end, where run_end is forced — same argument as the volume
    tiling).  When nchunks is already a TR multiple the producer's pad
    CONCAT (a full extra copy of the coefficients, ~1 ms at 128^3)
    disappears.  (A variant emitting per-chunk byte counts from the
    kernel measured SLOWER — the extra (TR,1) output per tile costs more
    than the XLA row-sum it saves.)
    """
    npad, lanes = fv_chunks.shape
    assert lanes == LANES and npad % TR == 0
    ntiles = npad // TR
    last = (npad - 8) // 8

    desc = pl.pallas_call(
        functools.partial(_kernel, ncpb=ncpb),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((TR, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (8, LANES),
                lambda i: (jnp.minimum((i + 1) * (TR // 8), last), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((TR, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, LANES), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(fv_chunks, fv_chunks)
    return desc


@functools.partial(
    jax.jit, static_argnames=("n", "ncpb", "chunk", "interpret")
)
def tokenize_desc_fast2(fv_chunks_padded, n, ncpb, chunk, interpret=False):
    """Drop-in for tokenize_desc_fast on pad_rows2-shaped input."""
    from . import rle_device

    assert chunk == LANES
    nchunks = n * ncpb
    desc = tokenize_tiles2(fv_chunks_padded, ncpb, interpret=interpret)
    desc = desc[:nchunks]
    chunk_bytes = (desc & 7).sum(-1).reshape(n, ncpb)
    sizes0 = chunk_bytes.sum(-1)
    cells = ncpb * chunk
    raw = sizes0 > 4 * cells
    sizes = jnp.where(raw, I32(4 * cells), sizes0)
    chunk_bytes = jnp.where(raw[:, None], I32(0), chunk_bytes).reshape(nchunks)
    active = chunk_bytes > 0
    acount = active.sum(dtype=I32)
    lcount = (
        (chunk_bytes + (rle_device.SUBROW - 1)) // rle_device.SUBROW
    ).sum(dtype=I32)
    counts = jnp.stack([acount, lcount])
    return desc, chunk_bytes, sizes, raw, counts


# ---------------------------------------------------------------------------
# Stripe variant (bx < 128): tokenize VOLUME-ORDER coefficient stripes.
# A (zg, by, nxp2) slab holds nbx2 block columns side by side; every scan
# that the chunk-row kernel runs across full rows runs here within
# bx-lane groups (masked rolls), and the cross-row zero-run carry is a
# per-lane VMEM row (one entry per block column) instead of a scalar.
# Descriptors come out in VOLUME order; only the small per-chunk byte
# table gets permuted to block-major (bytes/128 of a data relayout).
# This removes the 6D block-major transpose from the 32^3 compress path.
# ---------------------------------------------------------------------------


def _group_reverse_max(x, gl, g, fill):
    """Broadcast each g-lane group's max to all its lanes (masked rolls).

    `x` must already be the within-group prefix-max (so the group max
    lives at each group's last lane); gl = lane % g.
    """
    s = 1
    while s < g:
        W = x.shape[-1]
        nxt = jnp.where(gl < g - s, pltpu.roll(x, W - s, 1), fill)
        x = jnp.maximum(x, nxt)
        s *= 2
    return x


def _group_or_broadcast_from_lane0(x, gl, g):
    """Propagate each g-lane group's lane-0 value to the whole group
    (values elsewhere must be 0)."""
    s = 1
    while s < g:
        x = x | jnp.where(gl >= s, pltpu.roll(x, s, 1), 0)
        s *= 2
    return x


def _tile_desc_stripe(fv, nxt_row, carry_in, zt, byi, geom, ex, sp,
                      sy=None):
    """(TRS, W) volume-order stripe -> (desc, cost, carry_out).

    geom = (bx, by, zg, bz, nbx2, nby, cells).  Cell order within each
    bx-lane group column is block-major ((zl, yl) rows, xl lanes); groups
    are independent chunk chains.

    NARROW run carry (the round-3 restructure, PERF_NOTES round-2 #7):
    the cross-row zero-run state is ONE value per block column, so the
    cross-row scan runs on a (TRS, NL) per-column array — extracted from
    the full-width within-row prefix by an MXU one-hot matmul `ex`
    (W, NL) and spread back with `sp` (NL, W) — instead of 9 full-width
    (TRS, W) roll steps.  Cell indices are BLOCK-LOCAL (< cells <= 2^22,
    exact in the f32 HIGHEST-precision dots; each lane group of a tile
    belongs to exactly one block), so the block_base clamp of the old
    formulation is inherent and the carry resets at block-z boundaries
    (the kernel zeroes it when zt crosses bz//zg).  carry_in/out are
    (1, NL) float32.
    """
    bx, by, zg, bz, nbx2, nby, cells = geom
    TRS, W = fv.shape
    NL = ex.shape[1]
    hi = jax.lax.Precision.HIGHEST

    in_range = (fv >= jnp.float32(-2147483648.0)) & (
        fv < jnp.float32(2147483648.0)
    )
    tr = jnp.trunc(jnp.where(in_range, fv, 0.0))
    iv = jnp.where(in_range, tr.astype(I32), I32(INT32_MIN))

    izero = iv == 0
    is_byte = (iv > -125) & (iv < 125)
    is_short = (iv >= -32768) & (iv <= 32767)
    is_i3 = (iv >= -8388608) & (iv <= 8388607)

    rows = jax.lax.broadcasted_iota(I32, (TRS, W), 0)
    lane = jax.lax.broadcasted_iota(I32, (TRS, W), 1)
    l8 = lane % 8
    gl = lane % bx

    # group-of-8 modes (8 | bx, so 8-groups never straddle block columns)
    code = (
        izero.astype(I32)
        + (is_byte.astype(I32) << 4)
        + (is_short.astype(I32) << 8)
        + (is_i3.astype(I32) << 12)
    )
    if sy is not None:
        # one-hot G8 dots PER 128-LANE SLICE (a full (W, W) dot is ~9x
        # the FLOPs at W >= 384 and measured slower; the 128-wide form
        # is the _tile_desc winner) — group sums land on every lane of
        # each group, so the mode mask+OR-broadcast disappears too.
        # Slices write into the caller's scratch (Mosaic has no concat).
        li = jax.lax.broadcasted_iota(I32, (128, 128), 0)
        lj = jax.lax.broadcasted_iota(I32, (128, 128), 1)
        g8 = ((li // 8) == (lj // 8)).astype(jnp.float32)
        for t in range(W // 128):
            sl = slice(t * 128, (t + 1) * 128)
            sy[:, sl] = jnp.dot(
                code[:, sl].astype(jnp.float32), g8,
                preferred_element_type=jnp.float32, precision=hi,
            )
        y = sy[:, :W].astype(I32)
    else:
        y = code
        for s in (1, 2, 4):
            y = y + jnp.where(l8 < 8 - s, pltpu.roll(y, W - s, 1), 0)
    nzero = y & 15
    nb = (y >> 4) & 15
    ns = (y >> 8) & 15
    n3 = (y >> 12) & 15
    nozero = nzero == 0
    allbyte = nozero & (nb == 8)
    allshort = nozero & ~allbyte & (ns == 8) & (nb + (8 - nb) * 3 > 17)
    alli3 = (
        nozero & ~allbyte & ~allshort & (n3 == 8)
        & (nb + (ns - nb) * 3 + (8 - ns) * 4 > 25)
    )
    mode = jnp.where(allbyte, 1, jnp.where(allshort, 2, jnp.where(alli3, 3, 0)))
    if sy is None:
        # roll-chain sums are valid only at each group's lane 0
        mode = jnp.where(l8 == 0, mode, 0)
        mode = _group_or_broadcast_from_lane0(mode, l8, 8)

    # BLOCK-LOCAL cell index of every cell in the stripe
    zloc = (zt % (bz // zg)) * zg + rows // by
    yl = rows % by
    lidx = (zloc * by + yl) * bx + gl  # < cells <= 2^22
    member = izero

    # within-row, within-GROUP prefix of last-nonzero local index
    lnm = jnp.where(member, I32(-1), lidx)
    lnm = _cumscan_max(lnm, 1, gl, I32(-1))
    # narrow extract: each group's row max (at its last lane) -> column g
    gmax_n = jax.lax.dot_general(
        lnm.astype(jnp.float32), ex, (((1,), (0,)), ((), ())),
        precision=hi, preferred_element_type=jnp.float32,
    )  # (TRS, NL)
    rows_n = jax.lax.broadcasted_iota(I32, (TRS, NL), 0)
    scan_n = _cumscan_max(gmax_n, 0, rows_n, jnp.float32(-1.0))
    excl_n = jnp.where(
        rows_n == 0, jnp.float32(-1.0), pltpu.roll(scan_n, 1, 0)
    )
    prev_n = jnp.maximum(excl_n, carry_in)
    carry_out = jnp.maximum(carry_in, scan_n[TRS - 1 : TRS, :])
    # spread the per-column previous-rows state back to full width
    prev_full = jax.lax.dot_general(
        prev_n, sp, (((1,), (0,)), ((), ())),
        precision=hi, preferred_element_type=jnp.float32,
    ).astype(I32)
    lastnm = jnp.maximum(lnm, prev_full)
    run_len = lidx - lastnm

    # next cell in block-major order: (r, l+1) within the group; at the
    # group's LAST lane, the next row's group start brought into place by
    # a single +(bx-1) lane roll (consumed only where gl == bx-1)
    mem_i = member.astype(I32)
    a = jnp.where(gl < bx - 1, pltpu.roll(mem_i, W - 1, 1), 0)
    c = pltpu.roll(pltpu.roll(mem_i, TRS - 1, 0), bx - 1, 1)
    n0 = pltpu.roll(nxt_row.astype(I32), bx - 1, 1)
    nxt_member = jnp.where(
        gl < bx - 1, a, jnp.where(rows < TRS - 1, c, n0)
    ) != 0
    block_end = lidx == cells - 1
    run_end = member & (block_end | ~nxt_member)

    lane0 = l8 == 0
    cb_ = is_byte & ~izero
    cs_ = is_short & ~is_byte
    c3_ = is_i3 & ~is_short
    runcost = jnp.where(
        run_len == 1, 1,
        jnp.where(run_len < 256, 2, jnp.where(run_len <= MAX_RUN24, 4, 5)),
    )
    cost = jnp.where(
        mode == 1, 1,
        jnp.where(
            mode == 2, jnp.where(lane0, 3, 2),
            jnp.where(
                mode == 3, jnp.where(lane0, 4, 3),
                jnp.where(
                    izero, jnp.where(run_end, runcost, 0),
                    jnp.where(cb_, 1, jnp.where(cs_, 3, jnp.where(c3_, 4, 5))),
                ),
            ),
        ),
    ).astype(I32)

    desc = (
        cost
        | (run_end.astype(I32) << 3)
        | (jnp.minimum(run_len, MAX_RUN24) << 4)
    )
    # per-(row, block-column) byte counts via one more MXU dot (values
    # <= 5*bx, exact): the XLA epilogue's full-size `desc & 7` re-read +
    # lane-padded (.., bx)-minor reduction was ~3x the kernel's own cost
    cbrow = jax.lax.dot_general(
        cost.astype(jnp.float32), sp, (((1,), (1,)), ((), ())),
        precision=hi, preferred_element_type=jnp.float32,
    ).astype(I32)  # (TRS, NL)
    return desc, cbrow, carry_out


def _kernel_stripe(fv_ref, nxt_ref, ex_ref, sp_ref, desc_ref, cb_ref,
                   carry_ref, sy, *, geom):
    byi = pl.program_id(0)
    zt = pl.program_id(1)
    bx, by, zg, bz, nbx2, nby, cells = geom

    @pl.when(zt % (bz // zg) == 0)
    def _init():
        # new block row along z: local-index run state restarts
        carry_ref[0:1, :] = jnp.full_like(carry_ref[0:1, :], -1.0)

    W = nbx2 * bx
    fv = fv_ref[:, 0, :, :].reshape(zg * by, W)
    # next tile's first row, quantize-to-zero membership per lane
    nr = nxt_ref[0, 0, 0, :]
    nxt_row = ((nr > -1.0) & (nr < 1.0))[None, :]
    desc, cbrow, carry_out = _tile_desc_stripe(
        fv, nxt_row, carry_ref[0:1, :], zt, byi, geom, ex_ref[:], sp_ref[:],
        sy=sy,
    )
    carry_ref[0:1, :] = carry_out
    for zl in range(zg):
        desc_ref[zl, 0, :, :] = desc[zl * by : (zl + 1) * by, :]
        cb_ref[zl, 0, :, :] = cbrow[zl * by : (zl + 1) * by, :]


def stripe_path_ok(vol_shape3, block):
    """Conditions for the stripe (bx < 128) direct-volume tiling."""
    bx, by, bz = block
    if bx >= 128 or bx < 8 or by < 8:
        return False
    if by % (128 // bx):
        return False  # chunks must tile whole y-quads (pack patch gather)
    zg = max(1, min(bz, 512 // by))
    while bz % zg:
        zg -= 1
    return zg >= 1 and (bz % zg == 0)


@functools.partial(
    jax.jit, static_argnames=("vol_shape3", "block", "interpret")
)
def tokenize_tiles_stripe(fvv, vol_shape3, block, interpret=False):
    """fvv (nzp*nyp, nxp2) scaled VOLUME-ORDER plane (x-padded to 128-lane
    alignment) -> desc (nzp*nyp, nxp2) int32 in the SAME volume order."""
    nz, ny, nx = vol_shape3
    bx, by, bz = block
    from . import wavelet

    nbz, nby, nbx = -(-nz // bz), -(-ny // by), -(-nx // bx)
    nbx2 = wavelet.padded_nbx(nbx, bx)
    nzp, nyp, W = nbz * bz, nby * by, nbx2 * bx
    assert fvv.shape == (nzp * nyp, W)
    zg = max(1, min(bz, 512 // by))
    while bz % zg:
        zg -= 1
    ztiles = nbz * (bz // zg)
    cells = bx * by * bz
    geom = (bx, by, zg, bz, nbx2, nby, cells)
    v4 = fvv.reshape(nzp, nby, by, W)

    # one-hot extract/spread operators for the narrow run carry: column g
    # of `ex` picks each bx-group's LAST lane (the group's row max after
    # the within-group prefix scan); `sp` broadcasts column g back over
    # its group's lanes.  NL pads the column count to full lane tiles.
    NL = max(128, -(-nbx2 // 128) * 128)
    ex = np.zeros((W, NL), np.float32)
    ex[np.arange(nbx2) * bx + bx - 1, np.arange(nbx2)] = 1.0
    sp = np.zeros((NL, W), np.float32)
    sp[np.arange(W) // bx, np.arange(W)] = 1.0

    def in_map(byi, zt):
        return (zt, byi, 0, 0)

    def look_map(byi, zt):
        # window block extent along z is 1, so its index is an ABSOLUTE
        # z row (the main spec's unit is zg)
        return (jnp.minimum(zt + 1, ztiles - 1) * zg, byi, 0, 0)

    desc, cbrow = pl.pallas_call(
        functools.partial(_kernel_stripe, geom=geom),
        grid=(nby, ztiles),
        in_specs=[
            pl.BlockSpec((zg, 1, by, W), in_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, W), look_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, NL), lambda byi, zt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NL, W), lambda byi, zt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((zg, 1, by, W), in_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((zg, 1, by, NL), in_map, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nzp, nby, by, W), jnp.int32),
            jax.ShapeDtypeStruct((nzp, nby, by, NL), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, NL), jnp.float32),
            pltpu.VMEM((zg * by, W), jnp.float32),  # G8 slice scratch
        ],
        interpret=interpret,
    )(v4, v4, jnp.asarray(ex), jnp.asarray(sp))
    return desc.reshape(nzp * nyp, W), cbrow.reshape(nzp * nyp, NL)


# ---------------------------------------------------------------------------
# Fused stripe mega-kernel (bx < 128): wavelet x/y/z + scale + tokenize
# in ONE pass.  Tiles are FULL block rows (zg == bz, (bz, by, W) in
# VMEM), so per-axis cascades run as in-VMEM dots with contiguous
# scratch layouts:
#   z-mix:  slice y -> (bz, W), OpZ @ slice, write BY-MAJOR rows
#           [y*bz, (y+1)*bz)  (contiguous);
#   y-mix:  leading-split view (by, bz, W), slice z -> (by, W),
#           OpY @ slice, write VOLUME-ORDER rows [z*by, (z+1)*by)
#           (contiguous — the strided-write trap of the naive order
#           never appears);
#   x-mix:  one (TRS, W) @ blockdiag dot;
# then the proven _tile_desc_stripe body tokenizes.  zg == bz also
# makes every tile end at a block z-boundary: the run carry resets per
# tile and the lookahead value is irrelevant (block_end forces
# run_end), so no cross-tile coupling exists at all.
# x,z-before-y rounding differs from the staged einsums by ~1 ulp
# (commuting linear maps, same operators) — inside the 1e-5 oracle
# contract; containers stay self-consistent.
# ---------------------------------------------------------------------------


def stripe_fused_ok(vol_shape3, block):
    """Gate for the fused stripe kernel: stripe geometry with zg == bz
    and VMEM-sized (bz*by, W) buffers."""
    bx, by, bz = block
    if not stripe_path_ok(vol_shape3, block):
        return False
    nz, ny, nx = vol_shape3
    from . import wavelet

    nbx = -(-nx // bx)
    W = wavelet.padded_nbx(nbx, bx) * bx
    TRS = bz * by
    return TRS % 8 == 0 and TRS * W * 4 <= (3 << 20)


def _stripe_fused_tail(fv, zt, byi, geom, ex_ref, sp_ref, sy,
                       fv_ref, desc_ref, cb_ref):
    """Shared tokenize + output-store tail on the SCALED coefficients."""
    bx, by, zg, bz, nbx2, nby, cells = geom
    W = nbx2 * bx
    carry0 = jnp.full((1, ex_ref.shape[1]), -1.0, jnp.float32)
    nxt_row = jnp.zeros((1, W), I32) != 0  # block_end forces run_end
    desc, cbrow, _carry = _tile_desc_stripe(
        fv, nxt_row, carry0, zt, byi, geom, ex_ref[:], sp_ref[:], sy=sy
    )
    # NOTE round 3: emitting fv/desc directly in the thirds layout
    # ((.., T, 128) 5D out specs) to skip the XLA (R, W)->(R*T, 128)
    # reshape REGRESSED (~+1.4 ms at the CI config): T < 8 makes the
    # minor (T, 128) tile 3-of-8 sublane-padded, fattening every output
    # DMA ~2.7x, and the final collapse becomes a real relayout.  The
    # XLA reshape at the jit boundary runs near roofline (~0.8 ms) —
    # keep it.
    for zl in range(zg):
        fv_ref[zl, 0, :, :] = fv[zl * by : (zl + 1) * by, :]
        desc_ref[zl, 0, :, :] = desc[zl * by : (zl + 1) * by, :]
        cb_ref[zl, 0, :, :] = cbrow[zl * by : (zl + 1) * by, :]


def _cascade_xw(v_ref, opz_ref, opy_ref, opxt_ref, sA, sB, geom, split):
    """Shared x/y/z cascade body: volume slab -> PRE-SCALE coefficients
    (bz*by, W).

    NOTE round 3: composing z and y into ONE Kronecker (bz*by, bz*by)
    row-mixing dot REGRESSED (13.0-14.3 ms vs 11.6-12.3 at the CI
    config) — its 5x FLOPs cost more than the per-dot overhead of the
    2*bz tiny K=32 dots it replaced.  Batching those tiny dots along
    by*W also fails (Mosaic rejects a (bz, 1, by*W) input tile).  The
    per-slice loops stay.
    """
    bx, by, zg, bz, nbx2, nby, cells = geom
    Win = v_ref.shape[3]  # raw nx (x-only-pad variant) or W (padded)
    opz = opz_ref[:]
    opy = opy_ref[:]
    a4 = v_ref[:, 0, :, :]  # (bz, by, Win) volume slab
    for y in range(by):
        sA[y * bz : (y + 1) * bz, :] = mxu_dot3(opz, a4[:, y, :], split)
    vA = sA[:].reshape(by, bz, Win)
    for z in range(bz):
        sB[z * by : (z + 1) * by, :] = mxu_dot3(opy, vA[:, z, :], split)
    # the x operator is (Win, W): when Win < W its missing rows are the
    # x-pad zeros, so phantom block-columns materialize only HERE — no
    # padded copy of the whole volume is ever written (x-only-pad form)
    return mxu_dot3(sB[:], opxt_ref[:], split)


def _kernel_stripe_fused(v_ref, opz_ref, opy_ref, opxt_ref, ex_ref, sp_ref,
                         mf_ref, fv_ref, desc_ref, cb_ref, sA, sB, sy, *,
                         geom, split):
    byi = pl.program_id(0)
    zt = pl.program_id(1)  # == bzi (one tile per block row)
    xw = _cascade_xw(v_ref, opz_ref, opy_ref, opxt_ref, sA, sB, geom, split)
    fv = xw * mf_ref[:]  # (1, 1) global mulfac broadcast
    _stripe_fused_tail(fv, zt, byi, geom, ex_ref, sp_ref, sy,
                       fv_ref, desc_ref, cb_ref)


def _kernel_stripe_fused_local(v_ref, opz_ref, opy_ref, opxt_ref, ex_ref,
                               sp_ref, spt_ref, sc_ref, fv_ref, desc_ref,
                               cb_ref, mfo_ref, sA, sB, sy, *, geom, split):
    """Local-RMS variant: per-block RMS IN-KERNEL between the cascades
    and the tokenize (CvxCompress.cpp:343-348 — the mulfac comes from
    the transform OUTPUT).  The whole block lives in this tile, so the
    reduction is a sublane sum + one exact one-hot group-sum dot (spt);
    sc_ref carries `scale` and the per-block mulfacs leave via mfo_ref
    for the container's blkmulfac table (phantom x-pad columns get 1.0,
    matching _stage_w_stripe_local)."""
    byi = pl.program_id(0)
    zt = pl.program_id(1)
    bx, by, zg, bz, nbx2, nby, cells = geom
    xw = _cascade_xw(v_ref, opz_ref, opy_ref, opxt_ref, sA, sB, geom, split)
    rowsum = jnp.sum(xw * xw, axis=0, keepdims=True)  # (1, W)
    ss = mxu_dot3(rowsum, spt_ref[:], False)  # (1, NL) block Σx², exact
    rms = jnp.sqrt(ss / jnp.float32(cells))
    mfr = jnp.float32(1.0) / (rms * sc_ref[0, 0])
    mfr = jnp.where(rms == 0.0, jnp.float32(1.0), mfr)
    mfr = jnp.where(jnp.isfinite(mfr), mfr, jnp.float32(1.0))
    # Mosaic requires >= (8, 128) output tiles: the mulfac row leaves
    # broadcast over 8 sublanes (tiny; the wrapper reads row 0)
    mfo_ref[0, 0, :, :] = jnp.broadcast_to(mfr, (8, mfr.shape[1]))
    fv = xw * mxu_dot3(mfr, sp_ref[:], False)  # spread mf to lanes
    _stripe_fused_tail(fv, zt, byi, geom, ex_ref, sp_ref, sy,
                       fv_ref, desc_ref, cb_ref)


@functools.partial(
    jax.jit,
    static_argnames=("vol_shape3", "block", "use_local", "interpret"),
)
def stripe_fused_tiles(vpad, glob_mulfac, vol_shape3, block,
                       use_local=False, interpret=False):
    """(nzp*nyp, nxp2) PADDED RAW volume plane -> (fv, desc, cbrow, mf).

    fv is the scaled volume-order coefficient plane (identical layout to
    _stage_w_stripe's output — the pack stage gathers from it), desc and
    cbrow as tokenize_tiles_stripe.  With `use_local`, glob_mulfac is
    the SCALE, the kernel computes per-block mulfacs in-VMEM, and mf is
    the (nbz, nby, NL) mulfac table (else None).
    """
    nz, ny, nx = vol_shape3
    bx, by, bz = block
    from . import wavelet

    nbz, nby, nbx = -(-nz // bz), -(-ny // by), -(-nx // bx)
    nbx2 = wavelet.padded_nbx(nbx, bx)
    nzp, nyp, W = nbz * bz, nby * by, nbx2 * bx
    assert vpad.shape[0] == nzp * nyp and vpad.shape[1] in (nx, W)
    cells = bx * by * bz
    geom = (bx, by, bz, bz, nbx2, nby, cells)  # zg == bz
    # x-only-pad variant: a RAW (nzp*nyp, nx) plane (z/y block-aligned
    # volumes) is read directly — a block's lane dim may equal the
    # array's full last dim regardless of 128-alignment — and the
    # (nx, W) x operator adds the phantom columns in the kernel output
    Win = vpad.shape[1]
    v4 = vpad.reshape(nzp, nby, by, Win)
    TRS = bz * by

    NL = max(128, -(-nbx2 // 128) * 128)
    ex = np.zeros((W, NL), np.float32)
    ex[np.arange(nbx2) * bx + bx - 1, np.arange(nbx2)] = 1.0
    sp = np.zeros((NL, W), np.float32)
    sp[np.arange(W) // bx, np.arange(W)] = 1.0

    opz = wavelet._f32(wavelet.forward_matrix(bz)) if bz > 1 else \
        jnp.eye(max(bz, 1), dtype=jnp.float32)
    opy = wavelet._f32(wavelet.forward_matrix(by))
    opxt = jnp.asarray(wavelet._blockdiag(bx, W, inverse=False).T[:Win])
    mf = jnp.reshape(jnp.asarray(glob_mulfac, jnp.float32), (1, 1))

    def in_map(byi, zt):
        return (zt, byi, 0, 0)

    from . import wavelet as _wav

    split = (
        _wav.FLOAT_PREC is jax.lax.Precision.HIGH and not interpret
    )
    const_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda byi, zt: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((bz, 1, by, Win), in_map, memory_space=pltpu.VMEM),
        const_spec((bz, bz)),
        const_spec((by, by)),
        const_spec((Win, W)),
        const_spec((W, NL)),
        const_spec((NL, W)),
    ]
    out_specs = [
        pl.BlockSpec((bz, 1, by, W), in_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((bz, 1, by, W), in_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((bz, 1, by, NL), in_map, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nzp, nby, by, W), jnp.float32),
        jax.ShapeDtypeStruct((nzp, nby, by, W), jnp.int32),
        jax.ShapeDtypeStruct((nzp, nby, by, NL), jnp.int32),
    ]
    inputs = [v4, opz, opy, opxt, jnp.asarray(ex), jnp.asarray(sp)]
    if use_local:
        kernel = _kernel_stripe_fused_local
        in_specs += [const_spec((W, NL)), const_spec((1, 1))]
        inputs += [jnp.asarray(sp.T.copy()), mf]  # group-sum one-hot; scale
        out_specs.append(
            pl.BlockSpec((1, 1, 8, NL), lambda byi, zt: (zt, byi, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((nzp // bz, nby, 8, NL), jnp.float32)
        )
    else:
        kernel = _kernel_stripe_fused
        in_specs.append(const_spec((1, 1)))
        inputs.append(mf)
    outs = pl.pallas_call(
        functools.partial(kernel, geom=geom, split=split),
        grid=(nby, nbz),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((TRS, Win), jnp.float32),  # z result
            pltpu.VMEM((TRS, Win), jnp.float32),  # y result
            pltpu.VMEM((TRS, W), jnp.float32),    # G8 slice scratch
        ],
        # the whole-block-row tile plus _tile_desc_stripe's temporaries
        # exceed the 16M default scoped-vmem budget at W>=384 (measured
        # 26.2M at the CI config); v5e has 128M physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)
    fv, desc, cbrow = outs[0], outs[1], outs[2]
    return (
        fv.reshape(nzp * nyp, W),
        desc.reshape(nzp * nyp, W),
        cbrow.reshape(nzp * nyp, NL),
        outs[3][:, :, 0, :] if use_local else None,
    )


@functools.partial(
    jax.jit,
    static_argnames=("vol_shape3", "block", "use_local", "interpret"),
)
def stripe_fused_encode(vol, glob_mulfac, vol_shape3, block,
                        use_local=False, interpret=False):
    """Fully fused stripe producer: RAW volume in, (fv_plane, desc,
    cbrow, chunk_bytes, sizes, raw, counts, mf) out — subsumes
    _stage_w_stripe + tokenize_desc_stripe_fast in one kernel pass plus
    the XLA pad.  With `use_local`, glob_mulfac is the SCALE and mf is
    the per-block mulfac table (nnn,) (else None — one code path for
    both RMS modes, like CvxCompress.cpp:343-348)."""
    from . import wavelet

    nz, ny, nx = vol_shape3
    bx, by, bz = block
    nbz, nby, nbx = -(-nz // bz), -(-ny // by), -(-nx // bx)
    nbx2 = wavelet.padded_nbx(nbx, bx)
    nzp, nyp, nxp2 = nbz * bz, nby * by, nbx2 * bx
    if nz == nzp and ny == nyp:
        # z/y block-aligned (the common RTM shape): no padded copy of
        # the volume at all — the kernel's (nx, W) x operator carries
        # the x pad
        vpad = vol.reshape(nzp * nyp, nx)
    else:
        vpad = jnp.pad(
            vol, ((0, nzp - nz), (0, nyp - ny), (0, nxp2 - nx))
        ).reshape(nzp * nyp, nxp2)
    fv, desc, cbrow, mf = stripe_fused_tiles(
        vpad, glob_mulfac, vol_shape3, block, use_local=use_local,
        interpret=interpret,
    )
    cb, sizes, raw, counts = _stripe_accounting(
        cbrow, vol_shape3, block
    )
    if mf is not None:
        mf = mf[:, :, :nbx].reshape(-1)  # drop phantom x-pad columns
    return fv, desc, cbrow, cb, sizes, raw, counts, mf


def _stripe_accounting(cbrow, vol_shape3, block):
    """Shared XLA epilogue: per-chunk bytes (block-major), per-block
    sizes, raw flags, and the chunk+segment capacity counts."""
    from . import rle_device, wavelet

    nz, ny, nx = vol_shape3
    bx, by, bz = block
    nbz, nby, nbx = -(-nz // bz), -(-ny // by), -(-nx // bx)
    rpc = LANES // bx
    cells = bx * by * bz
    cpb = cells // LANES
    nnn = nbz * nby * nbx
    R = cbrow.shape[0]
    NL = cbrow.shape[1]
    per_chunk = cbrow.reshape(R // rpc, rpc, NL).sum(1)
    cb6 = per_chunk.reshape(nbz, bz, nby, by // rpc, NL)
    chunk_bytes = (
        cb6.transpose(0, 2, 4, 1, 3)[:, :, :nbx]
        .reshape(nnn, cpb)
    )
    sizes0 = chunk_bytes.sum(-1)
    raw = sizes0 > 4 * cells
    sizes = jnp.where(raw, I32(4 * cells), sizes0)
    chunk_bytes = jnp.where(
        raw[:, None], I32(0), chunk_bytes
    ).reshape(nnn * cpb)
    active = chunk_bytes > 0
    acount = active.sum(dtype=I32)
    lcount = (
        (chunk_bytes + (rle_device.SUBROW - 1)) // rle_device.SUBROW
    ).sum(dtype=I32)
    segc = rle_device.stripe_seg_counts(cbrow, raw, vol_shape3, block)
    counts = jnp.concatenate([jnp.stack([acount, lcount]), segc])
    return chunk_bytes, sizes, raw, counts


# ---------------------------------------------------------------------------
# Volume variant (bx >= 128): the tokenize kernel reads the scaled
# coefficient plane directly via BlockSpec index arithmetic — chunk rows
# for bx >= 128 are contiguous x-runs, so a (zg, by, bx) slab of the
# padded volume IS a tile of TR consecutive block-major chunks.  The
# block-major relayout never happens (the z-einsum permute + its ~2 ms
# cost at 128^3 are gone); desc output stays chunk-major as before.
# ---------------------------------------------------------------------------


def volume_path_ok(vol_shape3, block):
    """Conditions for the direct-volume tokenize tiling."""
    bx, by, bz = block
    if bx < 128 or bx * by * bz < TR * LANES:
        return False
    xpb = bx // LANES
    q = by * xpb  # chunks per (block, zl) layer
    if TR % q:
        return False
    zg = TR // q
    return bz % zg == 0


def _kernel_vol(fv_ref, nxt_ref, desc_ref, carry_ref, *, ncpb):
    """Volume-slab tile -> chunk-major descriptors (shared _tile_desc)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[0] = -1

    fv = fv_ref[:].reshape(TR, LANES)  # (zg, by, bx) slab == TR chunk rows
    desc, _cost, carry_out = _tile_desc(
        fv, nxt_ref[0], carry_ref[0], i, ncpb
    )
    carry_ref[0] = carry_out
    desc_ref[:] = desc


@functools.partial(
    jax.jit, static_argnames=("vol_shape3", "block", "interpret")
)
def tokenize_tiles_volume(fvv, vol_shape3, block, interpret=False):
    """fvv (nzp*nyp, nxp) scaled VOLUME-ORDER coeffs -> desc (nchunks, 128).

    Bit-identical descriptors to tokenize_tiles on the block-major layout
    (same kernel math; only the input BlockSpecs differ).
    """
    nz, ny, nx = vol_shape3
    bx, by, bz = block
    nbz, nby, nbx = -(-nz // bz), -(-ny // by), -(-nx // bx)
    nzp, nyp, nxp = nbz * bz, nby * by, nbx * bx
    xpb = bx // LANES
    cpb = by * bz * xpb  # chunks per block
    ncpb = cpb  # kernel's per-block chunk count (run resets)
    zg = TR // (by * xpb)  # z-layers per tile
    tpb = cpb // TR  # tiles per block
    nchunks = nbz * nby * nbx * cpb
    ntiles = nchunks // TR
    v3 = fvv.reshape(nzp, nyp, nxp)

    def in_map(t):
        b = t // tpb
        w = t % tpb
        bzi = b // (nby * nbx)
        byi = (b // nbx) % nby
        bxi = b % nbx
        return (bzi * (bz // zg) + w, byi, bxi)

    def look_map(t):
        # first 8 chunks of the NEXT tile (only cell [0,0] is consumed;
        # at the last tile, clamp — the final cell is a block end, where
        # run_end is forced regardless of the lookahead value)
        t1 = jnp.minimum(t + 1, ntiles - 1)
        b = t1 // tpb
        w = t1 % tpb
        bzi = b // (nby * nbx)
        byi = (b // nbx) % nby
        bxi = b % nbx
        return (bzi * bz + w * zg, (byi * by) // 8, bxi * xpb)

    desc = pl.pallas_call(
        functools.partial(_kernel_vol, ncpb=ncpb),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((zg, by, bx), in_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), look_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, LANES), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nchunks, LANES), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(v3, v3)
    return desc


@functools.partial(
    jax.jit, static_argnames=("vol_shape3", "block", "interpret")
)
def tokenize_desc_stripe_fast(fvv, vol_shape3, block, interpret=False):
    """Stripe-path producer: (desc_vol, chunk_bytes, sizes, raw, counts).

    desc_vol stays in VOLUME order (pack row-gathers it through the
    stripe rowmap); chunk_bytes/sizes/raw/counts are block-major — the
    permute moves bytes/128 of a data relayout (a small i32 transpose).
    """
    from . import rle_device, wavelet

    desc, cbrow = tokenize_tiles_stripe(
        fvv, vol_shape3, block, interpret=interpret
    )
    # per-chunk bytes from the kernel's per-(row, block-column) counts —
    # no full-size desc re-read, no (.., bx)-minor lane-padded reduce;
    # the counts carry the stripe SEGMENT capacity scalars at [2:5]
    chunk_bytes, sizes, raw, counts = _stripe_accounting(
        cbrow, vol_shape3, block
    )
    return desc, cbrow, chunk_bytes, sizes, raw, counts


@functools.partial(
    jax.jit, static_argnames=("vol_shape3", "block", "interpret")
)
def tokenize_desc_volume_fast(fvv, vol_shape3, block, interpret=False):
    """Volume-input drop-in for tokenize_desc_fast.

    Returns (desc, chunk_bytes, sizes, raw, counts) identical to the
    block-major path's.
    """
    from . import rle_device

    bx, by, bz = block
    cells = bx * by * bz
    ncpb_ = cells // LANES
    desc = tokenize_tiles_volume(fvv, vol_shape3, block, interpret=interpret)
    nchunks = desc.shape[0]
    n = nchunks // ncpb_
    chunk_bytes = (desc & 7).sum(-1).reshape(n, ncpb_)
    sizes0 = chunk_bytes.sum(-1)
    raw = sizes0 > 4 * cells
    sizes = jnp.where(raw, I32(4 * cells), sizes0)
    chunk_bytes = jnp.where(raw[:, None], I32(0), chunk_bytes).reshape(nchunks)
    active = chunk_bytes > 0
    acount = active.sum(dtype=I32)
    lcount = (
        (chunk_bytes + (rle_device.SUBROW - 1)) // rle_device.SUBROW
    ).sum(dtype=I32)
    counts = jnp.stack([acount, lcount])
    return desc, chunk_bytes, sizes, raw, counts


@functools.partial(
    jax.jit, static_argnames=("n", "ncpb", "chunk", "interpret")
)
def tokenize_desc_fast(fv_chunks_padded, n, ncpb, chunk, interpret=False):
    """Drop-in producer of (desc, chunk_bytes, sizes, raw, counts).

    fv_chunks_padded: (pad_rows(n*ncpb), 128) f32 SCALED coefficients
    (mulfac * coeff) in chunk layout, zero-padded.  Matches
    rle_device.tokenize_desc's outputs bit-for-bit.
    """
    from . import rle_device

    assert chunk == LANES
    nchunks = n * ncpb
    desc = tokenize_tiles(fv_chunks_padded, ncpb, interpret=interpret)
    desc = desc[:nchunks]
    # per-chunk byte counts: XLA row-sum over the cost field (~400 GC/s)
    chunk_bytes = (desc & 7).sum(-1).reshape(n, ncpb)
    sizes0 = chunk_bytes.sum(-1)
    cells = ncpb * chunk
    raw = sizes0 > 4 * cells
    sizes = jnp.where(raw, I32(4 * cells), sizes0)
    chunk_bytes = jnp.where(raw[:, None], I32(0), chunk_bytes).reshape(nchunks)
    active = chunk_bytes > 0
    acount = active.sum(dtype=I32)
    lcount = (
        (chunk_bytes + (rle_device.SUBROW - 1)) // rle_device.SUBROW
    ).sum(dtype=I32)
    counts = jnp.stack([acount, lcount])
    return desc, chunk_bytes, sizes, raw, counts


@functools.partial(jax.jit, static_argnames=("ncpb", "interpret"))
def tokenize_compact_tiles(fv_chunks, ncpb, interpret=False):
    """Fused tokenize + active-chunk compaction over (nchunks_pad, 128).

    Returns (cb (nchunks_pad-8,) i32 dense byte counts,
             fvc / dscc ((nchunks_pad-8)+TR, 128) compacted active rows,
             meta (..., 128) i32 — lane 0 = global chunk id, lane 1 = bytes).
    Active rows appear front-packed in chunk order with <=7 dead pad rows
    (meta bytes 0) after each tile's contribution.
    """
    npad1, lanes = fv_chunks.shape
    assert lanes == LANES and (npad1 - 8) % TR == 0
    ntiles = (npad1 - 8) // TR
    nout = (npad1 - 8) + TR

    cb, fvc, dscc, meta = pl.pallas_call(
        functools.partial(_kernel_compact, ncpb=ncpb),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((TR, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda i: ((i + 1) * TR // 8, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TR, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad1 - 8, 1), jnp.int32),
            jax.ShapeDtypeStruct((nout, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nout, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nout, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((TR, LANES), jnp.float32),
            pltpu.VMEM((TR, LANES), jnp.int32),
            pltpu.VMEM((TR, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(fv_chunks, fv_chunks)
    return cb.reshape(npad1 - 8), fvc, dscc, meta


@functools.partial(
    jax.jit, static_argnames=("n", "ncpb", "chunk", "interpret")
)
def tokenize_compact_fast(fv_chunks_padded, n, ncpb, chunk, interpret=False):
    """Fused path: (cb, sizes, raw, counts, fvc, dscc, meta).

    counts = [emitted_rows (incl <=7 pad rows per tile), lcount].
    Raw-fallback blocks' chunks ARE emitted (raw is only known after the
    block totals); downstream assembly filters them by block.
    """
    from . import rle_device

    assert chunk == LANES
    nchunks = n * ncpb
    cb, fvc, dscc, meta = tokenize_compact_tiles(
        fv_chunks_padded, ncpb, interpret=interpret
    )
    cbr = cb[:nchunks]
    sizes0 = cbr.reshape(n, ncpb).sum(-1)
    cells = ncpb * chunk
    raw = sizes0 > 4 * cells
    sizes = jnp.where(raw, I32(4 * cells), sizes0)
    # emitted rows: per-tile live counts padded to sublane multiples
    live = (cb > 0).astype(I32)  # includes trailing pad chunks (all-zero)
    per_tile = live.reshape(-1, TR).sum(-1)
    emitted = (((per_tile + 7) // 8) * 8).sum(dtype=I32)
    # subrow budget for the squeeze (raw-block chunks included: they are
    # packed then dropped at assembly)
    lcount = ((cb + (rle_device.SUBROW - 1)) // rle_device.SUBROW).sum(
        dtype=I32
    )
    counts = jnp.stack([emitted, lcount])
    return cbr, sizes, raw, counts, fvc, dscc, meta
