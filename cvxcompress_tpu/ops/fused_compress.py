"""Fused wavelet+tokenize Pallas kernels for (128, 128, 128) blocks.

The staged 128^3 compress pipeline (pad -> x/y/z einsums -> scale ->
tokenize kernel) makes ~5 full-size HBM round trips; its wavelet stage
alone measured 3.96 ms at the north-star config (PERF_NOTES round 2).
This module folds the whole device encode front into TWO kernels, each a
single read+write pass:

  K1 (x+z):  (bz, 8, bx) volume slabs; per y-slice the z cascade is ONE
             full-MXU (128,128)@(128,128) dot and the x cascade one more
             (right-multiplied by the transposed operator).  x and z
             commute with y exactly as linear maps (the reference's
             x->y->z order, Wavelet_Transform_Slow.cpp:275-279, is a
             choice of float rounding order, not of semantics; this
             path's output stays inside the 1e-5 oracle contract).
  K2 (y+scale+tokenize): (8, by, bx) chunk-order slabs; per z-slice the
             y cascade is one full-MXU dot, then mulfac scaling, then
             the PROVEN _tile_desc tokenize body (scalar zero-run carry,
             sequential chunk-major grid) — emitting BOTH the scaled
             coefficient chunks (pack's gather source) and descriptors.

Traffic: read vol + write plane (K1) + read plane + write fv + desc (K2)
= 5 array passes total vs ~9 for the staged path, and every matmul is a
full 128x128 MXU tile.  Gated to block == (128,128,128) with
block-aligned volume dims (the north-star shape); other configs keep the
staged paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import tokenize_pallas as tp
from . import wavelet

I32 = jnp.int32
F32 = jnp.float32
B = 128  # the one block extent this fused path serves
YG = 8  # y-rows per K1 slab
ZG = 8  # z-layers per K2 slab (chunk-order tiles: 8*128 rows == tp.TR)


def fused_path_ok(vol_shape3, block):
    """(128,128,128) blocks over block-aligned volume dims."""
    nz, ny, nx = vol_shape3
    return (
        tuple(block) == (B, B, B)
        and nz % B == 0 and ny % B == 0 and nx % B == 0
        and tp.TR == ZG * B
    )


def _kernel_xz(v_ref, opz_ref, opxt_ref, out_ref, *, split):
    """(bz, YG, bx) slab: z cascade then x cascade, per y-slice."""
    opz = opz_ref[:]
    opxt = opxt_ref[:]
    for y in range(YG):
        t = v_ref[:, y, :]  # (bz, bx)
        t = tp.mxu_dot3(opz, t, split)
        t = tp.mxu_dot3(t, opxt, split)
        out_ref[:, y, :] = t


@functools.partial(jax.jit, static_argnames=("vol_shape3", "interpret"))
def forward_xz(vol, vol_shape3, interpret=False):
    """Padded (nz, ny, nx) volume -> x+z-transformed plane, one pass."""
    nz, ny, nx = vol_shape3
    opz = wavelet._f32(wavelet.forward_matrix(B))
    opxt = wavelet._f32(wavelet.forward_matrix(B).T)
    grid = (nz // B, ny // YG, nx // B)
    # split3 measured a slight LOSS for full 128-wide dots (384^3
    # compress 7.1 ms vs 6.7 at HIGHEST — the bf16 split casts cost
    # more than the saved MXU passes at K=N=128); the stripe kernel's
    # W>=384 x-dot is where split3 wins (PERF_NOTES round 3)
    split = False
    return pl.pallas_call(
        functools.partial(_kernel_xz, split=split),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, YG, B), lambda zi, yi, xi: (zi, yi, xi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B), lambda zi, yi, xi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B), lambda zi, yi, xi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, YG, B), lambda zi, yi, xi: (zi, yi, xi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32),
        interpret=interpret,
    )(vol, opz, opxt)


def _kernel_ytok(v_ref, win_ref, opy_ref, mf_ref, fv_ref, desc_ref,
                 carry_ref, scratch, *, ncpb, split):
    """(ZG, by, bx) chunk-order slab: y cascade + scale + tokenize.

    Grid order is chunk-major (tiles per block follow the z cascade of
    chunks), so the zero-run scalar carry semantics are exactly
    _kernel_vol's.  The lookahead value is computed from the NEXT tile's
    first z-layer window: y-transform its x-lane-0 column, scale, and
    hand _tile_desc an (8, 128) array whose [0, 0] holds it.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[0] = -1

    opy = opy_ref[:]
    mf = mf_ref[:]  # (1, 1) broadcasts over every slice
    for z in range(ZG):
        t = v_ref[z, :, :]  # (by, bx)
        t = tp.mxu_dot3(opy, t, split)
        scratch[z * B : (z + 1) * B, :] = t * mf

    fv = scratch[:]
    # lookahead: next tile's first cell, y-transformed + scaled with the
    # IDENTICAL dot shape + multiply the next tile itself will run (a
    # sliced dot could round differently and desynchronize run_end from
    # the next tile's actual membership)
    wv = win_ref[0, :, :]  # (by, bx) first z-layer of the NEXT tile
    w2 = tp.mxu_dot3(opy, wv, split) * mf
    rb = jax.lax.broadcasted_iota(I32, (B, B), 0)
    lb = jax.lax.broadcasted_iota(I32, (B, B), 1)
    nxt0 = jnp.sum(jnp.where((rb == 0) & (lb == 0), w2, 0.0))
    r8 = jax.lax.broadcasted_iota(I32, (8, B), 0)
    l8 = jax.lax.broadcasted_iota(I32, (8, B), 1)
    nxt = jnp.where((r8 == 0) & (l8 == 0), nxt0, 0.0)

    desc, _cost, carry_out = tp._tile_desc(fv, nxt, carry_ref[0], i, ncpb)
    carry_ref[0] = carry_out
    fv_ref[:] = fv
    desc_ref[:] = desc


@functools.partial(jax.jit, static_argnames=("vol_shape3", "interpret"))
def tokenize_fused_y(plane, mulfac, vol_shape3, interpret=False):
    """x+z plane -> (fv_chunks, desc) via the fused y+scale+tokenize pass.

    Outputs are chunk-major (nchunks, 128): fv is the scaled coefficient
    source pack_active gathers from (identity row map), desc the usual
    descriptors.
    """
    nz, ny, nx = vol_shape3
    nbz, nby, nbx = nz // B, ny // B, nx // B
    cpb = B * B * B // 128
    nchunks = nbz * nby * nbx * cpb
    tpb = cpb // tp.TR  # tiles per block == bz // ZG
    ntiles = nchunks // tp.TR
    opy = wavelet._f32(wavelet.forward_matrix(B))
    mf = jnp.reshape(jnp.asarray(mulfac, jnp.float32), (1, 1))

    def in_map(t):
        b = t // tpb
        w = t % tpb
        bzi = b // (nby * nbx)
        byi = (b // nbx) % nby
        bxi = b % nbx
        return (bzi * (B // ZG) + w, byi, bxi)

    def look_map(t):
        t1 = jnp.minimum(t + 1, ntiles - 1)
        b = t1 // tpb
        w = t1 % tpb
        bzi = b // (nby * nbx)
        byi = (b // nbx) % nby
        bxi = b % nbx
        return (bzi * B + w * ZG, byi, bxi)

    split = False  # see forward_xz: HIGHEST wins for 128-wide dots
    fv, desc = pl.pallas_call(
        functools.partial(_kernel_ytok, ncpb=cpb, split=split),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((ZG, B, B), in_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, B), look_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tp.TR, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp.TR, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nchunks, 128), jnp.float32),
            jax.ShapeDtypeStruct((nchunks, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((tp.TR, 128), jnp.float32),
        ],
        interpret=interpret,
    )(plane, plane, opy, mf)
    return fv, desc


@functools.partial(
    jax.jit, static_argnames=("vol_shape3", "block", "interpret")
)
def tokenize_desc_fused(vol, glob_mulfac, vol_shape3, block,
                        interpret=False):
    """Fused-path producer: (fv_chunks, desc, chunk_bytes, sizes, raw,
    counts) — drop-in for the standard bx>=128 encode front."""
    from . import rle_device

    assert fused_path_ok(vol_shape3, block)
    cells = B * B * B
    plane = forward_xz(vol, vol_shape3, interpret=interpret)
    fv, desc = tokenize_fused_y(
        plane, glob_mulfac, vol_shape3, interpret=interpret
    )
    nchunks = desc.shape[0]
    ncpb = cells // 128
    n = nchunks // ncpb
    chunk_bytes = (desc & 7).sum(-1).reshape(n, ncpb)
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
    return fv, desc, chunk_bytes, sizes, raw, counts


# Raw-fallback blocks reuse the standard _raw_chunks einsum twin (the
# stored raw coefficients need only be valid block coefficients — every
# transform variant here is inside the 1e-5 oracle contract, and raw
# payload size is the fixed 4*cells regardless).


# ---------------------------------------------------------------------------
# Whole-block single-kernel variant (CVX_FUSED_W=block): the ENTIRE
# (128, 128, 128) block — z, x, and y cascades plus scale and tokenize —
# in one VMEM residency.  Removes K1<->K2's full-volume HBM round trip
# (write + read of the xz plane, ~450 MB at 384^3) and the separate
# lookahead window stream.  VMEM: 8 MB block in, 8 MB scratch, 8 MB fv +
# 8 MB desc out, double-buffered by Pallas => needs the raised
# vmem_limit_bytes.  Rounding order matches the two-kernel path
# (z, x, then y — identical operator dots), so containers are
# byte-identical to CVX_FUSED_W=1.
# ---------------------------------------------------------------------------


def _block_tokenize_tail(fv_ref, desc_ref, mf=None):
    """Tokenize the whole-block fv_ref in TR-row sub-tiles (one
    16384-row _tile_desc call makes every temporary 8 MB and blows the
    scoped-vmem budget — measured 124.7M); the carry chains through a
    plain loop variable (the whole block lives in this one grid step),
    the lookahead window reads the next sub-tile's head straight from
    VMEM, and zero runs never span blocks so the chain starts at -1.

    With `mf` (local-RMS mode) fv_ref holds UNSCALED coefficients on
    entry: each sub-tile is scaled in the same pass that tokenizes it
    and written back (a separate whole-block scale loop spilled 79 M of
    registers and blew physical VMEM — measured round 4)."""
    ncpb = B * B * B // 128
    ntiles = ncpb // tp.TR
    carry = jnp.int32(-1)
    zero8 = jnp.zeros((8, 128), jnp.float32)
    for t in range(ntiles):
        fv_t = fv_ref[t * tp.TR : (t + 1) * tp.TR, :]
        nxt = (
            fv_ref[(t + 1) * tp.TR : (t + 1) * tp.TR + 8, :]
            if t + 1 < ntiles else zero8  # block_end forces run_end
        )
        if mf is not None:
            fv_t = fv_t * mf
            nxt = nxt * mf
            fv_ref[t * tp.TR : (t + 1) * tp.TR, :] = fv_t
        desc_t, _cost, carry = tp._tile_desc(
            fv_t, nxt, carry, pl.program_id(0) * ntiles + t, ncpb
        )
        desc_ref[t * tp.TR : (t + 1) * tp.TR, :] = desc_t


def _kernel_block(v_ref, opz_ref, opxt_ref, opy_ref, mf_ref, fv_ref,
                  desc_ref, sA, *, split):
    opz = opz_ref[:]
    opxt = opxt_ref[:]
    opy = opy_ref[:]
    mf = mf_ref[:]
    # z then x cascade, per y-slice (identical dot shapes to _kernel_xz)
    for y in range(B):
        t = v_ref[:, y, :]  # (bz, bx)
        t = tp.mxu_dot3(opz, t, split)
        t = tp.mxu_dot3(t, opxt, split)
        sA[y, :, :] = t
    # y cascade per z-slice + scale (identical to _kernel_ytok's dot)
    for z in range(B):
        t = sA[:, z, :]  # (by, bx)
        t = tp.mxu_dot3(opy, t, split)
        fv_ref[z * B : (z + 1) * B, :] = t * mf

    _block_tokenize_tail(fv_ref, desc_ref)


def _kernel_block_casc_local(v_ref, opz_ref, opxt_ref, opy_ref, sc_ref,
                             fv_ref, mfo_ref, sA, srow, *, split):
    """Local-RMS L1 kernel: cascades + per-block RMS, NO tokenize.

    The block's coefficient RMS is computed while the coefficients are
    VMEM-resident (CvxCompress.cpp:343-348 computes it on the transform
    output).  The tokenize cannot ride in the same kernel: combining ANY
    reduction with the unrolled tokenize tail crosses a Mosaic compile
    cliff (tpu_compile_helper dies after ~86 s, no diagnostics —
    round 4 bisect: cascades+reduce alone OK, tokenize+dummy-passes
    alone OK, any reduce+tokenize combination fails), so local mode
    runs as TWO kernels with one extra fv read+write pass (~0.6 ms at
    384³).  sc_ref carries `scale`; the per-block mulfac leaves via
    mfo_ref (broadcast over one (8, 128) tile — Mosaic's minimum)."""
    opz = opz_ref[:]
    opxt = opxt_ref[:]
    opy = opy_ref[:]
    for y in range(B):
        t = v_ref[:, y, :]
        t = tp.mxu_dot3(opz, t, split)
        sA[y, :, :] = tp.mxu_dot3(t, opxt, split)
    for z in range(B):
        t = tp.mxu_dot3(opy, sA[:, z, :], split)
        fv_ref[z * B : (z + 1) * B, :] = t
        srow[z : z + 1, :] = jnp.sum(t * t, axis=0, keepdims=True)
    rms = jnp.sqrt(jnp.sum(srow[:]) / jnp.float32(B * B * B))
    mf = jnp.float32(1.0) / (rms * sc_ref[0, 0])
    mf = jnp.where(rms == 0.0, jnp.float32(1.0), mf)
    mf = jnp.where(jnp.isfinite(mf), mf, jnp.float32(1.0))
    mfo_ref[0, :, :] = jnp.full((8, 128), mf, jnp.float32)


def local_onek():
    """Round-5 single-kernel local-RMS gate (CVX_LOCAL_ONEK=1).

    The round-4 bisect found ANY reduce+tokenize combination crosses a
    Mosaic compile cliff (tpu_compile_helper dies after ~86 s, no
    diagnostics), forcing the two-kernel L1/L2 split and an extra HBM
    round trip of the coefficient plane (~1.6 ms at 384^3; local-RMS
    recorded at 0.76x of global in BENCH_dev_r05).  This variant dodges
    the cliff by expressing the RMS reduction as MXU dots (elementwise
    accumulate over z-slices, then two ones-matmuls) — no vector-unit
    reduce op anywhere in the kernel.  Off by default until validated
    on the real toolchain."""
    import os

    return os.environ.get("CVX_LOCAL_ONEK", "0") == "1"


def _kernel_block_local1(v_ref, opz_ref, opxt_ref, opy_ref, sc_ref,
                         fv_ref, desc_ref, mfo_ref, sA, *, split):
    """Local-RMS SINGLE kernel: cascades + in-VMEM block RMS + scale +
    tokenize, one VMEM residency per block (mirrors _kernel_block; the
    RMS uses matmul reductions only — see local_onek's cliff note).

    The accumulation order (elementwise Σ_z t∘t, then ones-dots) differs
    from the two-kernel L1's per-row sums; both are f32 and land within
    the staged path's 1e-5 mulfac contract (test_block_kernel_local_rms).
    """
    hi = jax.lax.Precision.HIGHEST
    opz = opz_ref[:]
    opxt = opxt_ref[:]
    opy = opy_ref[:]
    for y in range(B):
        t = v_ref[:, y, :]
        t = tp.mxu_dot3(opz, t, split)
        sA[y, :, :] = tp.mxu_dot3(t, opxt, split)
    acc = jnp.zeros((B, B), jnp.float32)
    for z in range(B):
        t = tp.mxu_dot3(opy, sA[:, z, :], split)
        fv_ref[z * B : (z + 1) * B, :] = t
        acc = acc + t * t
    ones8 = jnp.ones((8, B), jnp.float32)
    colsum = jax.lax.dot(ones8, acc, precision=hi)  # (8, B), rows equal
    tot = jax.lax.dot(colsum, ones8.T, precision=hi)  # (8, 8), all equal
    rms = jnp.sqrt(tot[0, 0] / jnp.float32(B * B * B))
    mf = jnp.float32(1.0) / (rms * sc_ref[0, 0])
    mf = jnp.where(rms == 0.0, jnp.float32(1.0), mf)
    mf = jnp.where(jnp.isfinite(mf), mf, jnp.float32(1.0))
    mfo_ref[0, :, :] = jnp.full((8, 128), mf, jnp.float32)
    _block_tokenize_tail(fv_ref, desc_ref, mf=mf)


def _kernel_scale_tok(v_ref, w_ref, mf_ref, mfn_ref, fv_ref, desc_ref,
                      carry_ref, *, ncpb):
    """Local-RMS L2 kernel: per-TR-tile scale + tokenize of the UNSCALED
    coefficient plane (streamed like _kernel_ytok, minus the y dot).

    mf_ref / mfn_ref carry THIS tile's and the NEXT tile's block mulfac
    (block-constant per tile since TR divides cpb); the lookahead window
    is scaled with the next tile's mulfac — the identical multiply that
    tile will run, so run_end never desynchronizes."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[0] = -1

    fv = v_ref[:] * mf_ref[0, 0, 0]
    nxt = w_ref[:] * mfn_ref[0, 0, 0]
    desc, _cost, carry = tp._tile_desc(fv, nxt, carry_ref[0], i, ncpb)
    carry_ref[0] = carry
    fv_ref[:] = fv
    desc_ref[:] = desc


@functools.partial(
    jax.jit, static_argnames=("vol_shape3", "use_local", "onek",
                              "interpret")
)
def tokenize_block_fused(vol, mulfac, vol_shape3, use_local=False,
                         onek=False, interpret=False):
    """(nz, ny, nx) volume -> (fv_chunks, desc, mf), one kernel pass.

    With `use_local`, mulfac is the SCALE, the per-block RMS is computed
    in-VMEM, and mf is the (nblocks,) mulfac table (else None); `onek`
    selects the single-kernel local variant (see local_onek)."""
    nz, ny, nx = vol_shape3
    nbz, nby, nbx = nz // B, ny // B, nx // B
    cells = B * B * B
    cpb = cells // 128
    nblocks = nbz * nby * nbx
    opz = wavelet._f32(wavelet.forward_matrix(B))
    opxt = wavelet._f32(wavelet.forward_matrix(B).T)
    opy = wavelet._f32(wavelet.forward_matrix(B))
    mf = jnp.reshape(jnp.asarray(mulfac, jnp.float32), (1, 1))
    split = False  # HIGHEST wins for 128-wide dots (see forward_xz)

    def in_map(b):
        bzi = b // (nby * nbx)
        byi = (b // nbx) % nby
        bxi = b % nbx
        return (bzi, byi, bxi)

    if use_local and onek:
        # SINGLE kernel: cascades + MXU-dot RMS + scale + tokenize
        fv, desc, mfo = pl.pallas_call(
            functools.partial(_kernel_block_local1, split=split),
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((B, B, B), in_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((B, B), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, B), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, B), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((cpb, 128), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cpb, 128), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nblocks * cpb, 128), jnp.float32),
                jax.ShapeDtypeStruct((nblocks * cpb, 128), jnp.int32),
                jax.ShapeDtypeStruct((nblocks, 8, 128), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((B, B, B), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(vol, opz, opxt, opy, mf)
        return fv, desc, mfo[:, 0, 0]

    if use_local:
        # TWO kernels (see _kernel_block_casc_local's compile-cliff note)
        fvu, mfo = pl.pallas_call(
            functools.partial(_kernel_block_casc_local, split=split),
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((B, B, B), in_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((B, B), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, B), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, B), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((cpb, 128), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nblocks * cpb, 128), jnp.float32),
                jax.ShapeDtypeStruct((nblocks, 8, 128), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((B, B, B), jnp.float32),
                pltpu.VMEM((B, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(vol, opz, opxt, opy, mf)
        mfb = mfo[:, 0, 0]
        tpb = cpb // tp.TR
        ntiles = nblocks * tpb

        def t_map(t):
            return (t, 0)

        def look_map(t):
            return (jnp.minimum(t + 1, ntiles - 1) * (tp.TR // 8), 0)

        # the mulfacs ride as L1's (nblocks, 8, 128) tiles — Mosaic's
        # minimum tile, and (1, 1)-blocked 2D views violate the (8, 128)
        # block-shape rule when nblocks > 1
        def mf_map(t):
            return (t // tpb, 0, 0)

        def mfn_map(t):
            return (jnp.minimum(t + 1, ntiles - 1) // tpb, 0, 0)

        fv, desc = pl.pallas_call(
            functools.partial(_kernel_scale_tok, ncpb=cpb),
            grid=(ntiles,),
            in_specs=[
                pl.BlockSpec((tp.TR, 128), t_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), look_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 128), mf_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 128), mfn_map,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((tp.TR, 128), t_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((tp.TR, 128), t_map, memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nblocks * cpb, 128), jnp.float32),
                jax.ShapeDtypeStruct((nblocks * cpb, 128), jnp.int32),
            ),
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
            interpret=interpret,
        )(fvu, fvu, mfo, mfo)
        return fv, desc, mfb

    fv, desc = pl.pallas_call(
        functools.partial(_kernel_block, split=split),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((B, B, B), in_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((cpb, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cpb, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nblocks * cpb, 128), jnp.float32),
            jax.ShapeDtypeStruct((nblocks * cpb, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, B, B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(vol, opz, opxt, opy, mf)
    return fv, desc, None


@functools.partial(
    jax.jit,
    static_argnames=("vol_shape3", "block", "use_local", "onek",
                     "interpret"),
)
def tokenize_desc_block(vol, glob_mulfac, vol_shape3, block,
                        use_local=False, onek=False, interpret=False):
    """Whole-block producer: same contract as tokenize_desc_fused, plus
    the per-block mulfac table when `use_local` (glob_mulfac = scale)."""
    from . import rle_device

    assert fused_path_ok(vol_shape3, block)
    cells = B * B * B
    fv, desc, mf = tokenize_block_fused(
        vol, glob_mulfac, vol_shape3, use_local=use_local, onek=onek,
        interpret=interpret,
    )
    nchunks = desc.shape[0]
    ncpb = cells // 128
    n = nchunks // ncpb
    chunk_bytes = (desc & 7).sum(-1).reshape(n, ncpb)
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
    return fv, desc, chunk_bytes, sizes, raw, counts, mf
