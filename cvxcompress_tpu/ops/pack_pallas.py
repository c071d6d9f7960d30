"""Pallas TPU kernel for the pack pass (PASS 2 byte-packing core).

The XLA formulation of the staging front-pack costs ~10 ms on the
reference CI config: the 10 log-shift rounds each materialize the
(acap, 5Q) staging to HBM, plus a pathological (A, Q, 5) interleave
relayout.  This kernel does the whole byte-packing in ONE VMEM pass per
row tile:

  1. recompute quantized values + classes + group modes from the gathered
     (A, 128) scaled coefficients (same lane-shift machinery as the
     tokenize kernel),
  2. rebuild the 5 token byte-planes from the descriptors,
  3. interleave them into the (A, 640) cell-major staging **on the MXU**:
     staging[:, 5i+k] = plane_k[:, i] is 5 spread matmuls plane_k @ S_k
     with 0/1 selection matrices (exact in f32 for byte values),
  4. compute per-byte move distances (5i - off_i via an in-register lane
     prefix sum) and run all 10 monotone log-shift rounds in VMEM,
  5. write the front-packed (A, 640) staging rows.

Inputs are the row-gathered active chunks (gathers stay in XLA — row
gathers are fast); the subrow squeeze stays in XLA too.  Byte-identical
to rle_device.pack_active's staging (tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import tokenize_pallas as tp

I32 = jnp.int32
F32 = jnp.float32

Q = 128  # chunk cells (lanes)
SQ = 5 * Q  # staging slots per chunk
GR = 512  # chunk rows per grid step

_B_RLESC1 = 127
_B_RLESC3 = 125
_B_VLESC2 = 0x83
_B_VLESC3 = 0x81
_B_VLESC4 = 0x80
_B_VLESC2_8X = 0x82
_B_VLESC3_8X = 0x7E
MAX_RUN24 = (1 << 24) - 1


def available():
    """Pallas kernels engage on real TPU backends only."""
    return jax.default_backend() == "tpu"


def _kernel_patch(gf_ref, gd_ref, b_ref, of_ref, od_ref, *, bx, rpc, xt):
    """Gathered (gr, rpc, xt, 128) chunk patches -> (gr, 128) chunk rows.

    Patch row i holds chunk i's full rpc x W plane patch; its cells sit
    at [k, tt, wv*bx:(wv+1)*bx) with tt = bxi//wpr, wv = bxi%wpr (wpr ==
    rpc since both equal 128//bx).  Output lane [k*bx, (k+1)*bx) takes
    tile (k, tt) shifted by (k - wv)*bx — rpc*xt*rpc static roll+selects
    in VMEM, replacing an XLA chain that materialized ~3 GB.
    """
    gr = of_ref.shape[0]
    lane = jax.lax.broadcasted_iota(I32, (gr, 128), 1)
    bxi = b_ref[:]  # (gr, 1) broadcast
    tt = bxi // rpc
    wv = bxi % rpc
    of = jnp.zeros_like(of_ref)
    od = jnp.zeros_like(od_ref)
    for k in range(rpc):
        # hoist the x-tile select, then one roll-select per window
        xf = gf_ref[:, k, 0, :]
        xd = gd_ref[:, k, 0, :]
        for t in range(1, xt):
            mt = tt == t
            xf = jnp.where(mt, gf_ref[:, k, t, :], xf)
            xd = jnp.where(mt, gd_ref[:, k, t, :], xd)
        target = (lane >= k * bx) & (lane < (k + 1) * bx)
        for w in range(rpc):
            sh = ((k - w) * bx) % 128
            m = target & (wv == w)
            of = jnp.where(m, pltpu.roll(xf, sh, 1) if sh else xf, of)
            od = jnp.where(m, pltpu.roll(xd, sh, 1) if sh else xd, od)
    of_ref[:] = of
    od_ref[:] = od


@functools.partial(jax.jit, static_argnames=("bx", "rpc", "xt", "interpret"))
def patch_extract(gf, gd, bxi, bx, rpc, xt, interpret=False):
    """(acap, rpc, xt, 128) gathered fv/desc patches + (acap, 1) x-block
    ids -> (acap, 128) chunk-major rows (exact: shifts/selects only)."""
    acap = gf.shape[0]
    # small tiles: the (gr, rpc, xt, 128) operands + unrolled roll
    # temporaries must fit the 16-MB scoped VMEM (double-buffered)
    gr = min(acap, 128)
    assert acap % gr == 0
    return pl.pallas_call(
        functools.partial(_kernel_patch, bx=bx, rpc=rpc, xt=xt),
        grid=(acap // gr,),
        in_specs=[
            pl.BlockSpec((gr, rpc, xt, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gr, rpc, xt, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gr, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((gr, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gr, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((acap, 128), gf.dtype),
            jax.ShapeDtypeStruct((acap, 128), gd.dtype),
        ),
        interpret=interpret,
    )(gf, gd, bxi)


@functools.lru_cache(maxsize=None)
def _spread_matrices():
    """S_k (Q, 5Q) with S_k[i, 5i+k] = 1, and their sum S_all."""
    ss = []
    for k in range(5):
        m = np.zeros((Q, SQ), np.float32)
        m[np.arange(Q), 5 * np.arange(Q) + k] = 1.0
        ss.append(m)
    return np.stack(ss), np.stack(ss).sum(0)


def _byte(v, k):
    return jax.lax.shift_right_logical(v, jnp.int32(8 * k)) & 0xFF


def _kernel(fv_ref, dsc_ref, s5_ref, sall_ref, out_ref, *, out_cols=SQ):
    fv = fv_ref[:]  # (GR, Q) f32 scaled coefficients of active chunks
    dsc = dsc_ref[:]  # (GR, Q) i32 descriptors

    lane = jax.lax.broadcasted_iota(I32, (GR, Q), 1)

    # --- quantize + classes (identical to the tokenize kernel)
    in_range = (fv >= jnp.float32(-2147483648.0)) & (
        fv < jnp.float32(2147483648.0)
    )
    trv = jnp.trunc(jnp.where(in_range, fv, 0.0))
    iv = jnp.where(in_range, trv.astype(I32), I32(tp.INT32_MIN))
    izero = iv == 0
    is_byte = (iv > -125) & (iv < 125)
    is_short = (iv >= -32768) & (iv <= 32767)
    is_i3 = (iv >= -8388608) & (iv <= 8388607)

    code = (
        izero.astype(I32)
        + (is_byte.astype(I32) << 4)
        + (is_short.astype(I32) << 8)
        + (is_i3.astype(I32) << 12)
    )
    y = code
    for s in (1, 2, 4):
        y = y + jnp.where(lane < Q - s, pltpu.roll(y, Q - s, 1), 0)
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
    mode = jnp.where(lane % 8 == 0, mode, 0)
    for s in (1, 2, 4):
        mode = mode | jnp.where(lane >= s, pltpu.roll(mode, s, 1), 0)

    # --- descriptor fields + planes (grammar identical to rle_device._planes)
    cost = dsc & 7
    run_end = (dsc >> 3) & 1
    rl = jax.lax.shift_right_logical(dsc, 4)
    lane0 = lane % 8 == 0
    pb, ps, p3 = mode == 1, mode == 2, mode == 3
    member = izero
    cb_ = is_byte & ~izero
    cs_ = is_short & ~is_byte
    c3_ = is_i3 & ~is_short
    big = rl >= 256
    split = member & (cost == 5)
    fvb = jax.lax.bitcast_convert_type(fv, I32)
    del run_end

    def sel(*pairs_and_default):
        out = pairs_and_default[-1]
        for i in range(len(pairs_and_default) - 3, -1, -2):
            out = jnp.where(pairs_and_default[i], pairs_and_default[i + 1], out)
        return out

    plane0 = sel(
        pb, _byte(iv, 0),
        ps, jnp.where(lane0, _B_VLESC2_8X, _byte(iv, 0)),
        p3, jnp.where(lane0, _B_VLESC3_8X, _byte(iv, 0)),
        member, sel((rl == 1) & ~split, 0, big | split, _B_RLESC3, _B_RLESC1),
        cb_, _byte(iv, 0),
        cs_, _B_VLESC2,
        c3_, _B_VLESC3,
        _B_VLESC4,
    )
    plane1 = sel(
        ps, jnp.where(lane0, _byte(iv, 0), _byte(iv, 1)),
        p3, jnp.where(lane0, _byte(iv, 0), _byte(iv, 1)),
        member, _byte(rl, 0),
        cb_ | pb, 0,
        cs_ | c3_, _byte(iv, 0),
        _byte(fvb, 0),
    )
    plane2 = sel(
        ps, _byte(iv, 1),
        p3, jnp.where(lane0, _byte(iv, 1), _byte(iv, 2)),
        member, _byte(rl, 1),
        cs_ | c3_, _byte(iv, 1),
        _byte(fvb, 1),
    )
    plane3 = sel(
        p3, _byte(iv, 2),
        member, _byte(rl, 2),
        c3_, _byte(iv, 2),
        _byte(fvb, 2),
    )
    plane4 = sel(
        member, 0,
        _byte(fvb, 3),
    )

    # --- MXU spread into cell-major staging: staging[:, 5i+k] = plane_k[:, i]
    # DEFAULT precision (ONE bf16 MXU pass) is EXACT here: the operands
    # are byte values (0..255, inside bf16's 8-bit integer range) and the
    # selection matrices are one-hot per column, so each output is a
    # single product with no accumulation rounding (round-5 fix: HIGHEST
    # ran ~6 passes per dot and made this kernel the pack's hot spot —
    # +3.1 ms of the CI config's 5.4 ms pack, probe_pack bisect)
    lo = jax.lax.Precision.DEFAULT
    hi = jax.lax.Precision.HIGHEST
    s5 = s5_ref[:]  # (5, Q, SQ) selection matrices
    staging = jnp.dot(plane0.astype(F32), s5[0],
                      preferred_element_type=F32, precision=lo)
    staging += jnp.dot(plane1.astype(F32), s5[1],
                       preferred_element_type=F32, precision=lo)
    staging += jnp.dot(plane2.astype(F32), s5[2],
                       preferred_element_type=F32, precision=lo)
    staging += jnp.dot(plane3.astype(F32), s5[3],
                       preferred_element_type=F32, precision=lo)
    staging += jnp.dot(plane4.astype(F32), s5[4],
                       preferred_element_type=F32, precision=lo)
    staging = staging.astype(I32)

    # --- per-byte move distances: dist[5i+k] = 5i - off_i (live), -1 dead
    # off = exclusive lane prefix sum of cost
    ps_ = cost
    for s in (1, 2, 4, 8, 16, 32, 64):
        ps_ = ps_ + jnp.where(lane >= s, pltpu.roll(ps_, s, 1), 0)
    off = ps_ - cost  # exclusive
    base = 5 * lane - off
    # dist bases reach 5*Q = 640 > bf16's exact-integer range: these two
    # one-hot dots stay HIGHEST (the chunk kernel's lane domain is 128)
    sall = sall_ref[:]  # (Q, SQ) sum of selections
    d0 = jnp.dot((base + 1).astype(F32), sall,
                 preferred_element_type=F32, precision=hi)
    cost5 = jnp.dot(cost.astype(F32), sall,
                    preferred_element_type=F32, precision=hi)
    kcol = jax.lax.broadcasted_iota(I32, (GR, SQ), 1) % 5
    liv = kcol < cost5.astype(I32)
    dist = jnp.where(liv, d0.astype(I32) - 1, -1)

    # --- monotone log-shift front-pack, all rounds in VMEM
    lanes_sq = jax.lax.broadcasted_iota(I32, (GR, SQ), 1)
    x = staging
    s = 1
    while s < SQ:
        inc_d = jnp.where(lanes_sq < SQ - s, pltpu.roll(dist, SQ - s, 1), -1)
        inc_x = jnp.where(lanes_sq < SQ - s, pltpu.roll(x, SQ - s, 1), 0)
        take = (inc_d >= 0) & ((inc_d & s) != 0)
        moveout = (dist >= 0) & ((dist & s) != 0)
        x = jnp.where(take, inc_x, x)
        dist = jnp.where(take, inc_d - s, jnp.where(moveout, -1, dist))
        s *= 2
    out_ref[:] = x[:, :out_cols]


@functools.lru_cache(maxsize=None)
def _spread_matrices_seg(bx):
    """Per-SEGMENT spread matrices for the stripe pack kernel.

    A gathered 128-lane stripe row holds 128//bx independent bx-cell
    segments (block columns).  Cell i's k-th byte lands at staging lane
    pitch*(i//bx) + 5*(i%bx) + k, where pitch = ceil(5*bx/64)*64 —
    SUBROW-aligned so each segment's payload occupies its own whole
    subrows and the XLA squeeze needs no cross-segment arithmetic.
    """
    nseg = Q // bx
    pitch = -(-5 * bx // 64) * 64
    out = nseg * pitch
    ss = []
    for k in range(5):
        m = np.zeros((Q, out), np.float32)
        i = np.arange(Q)
        m[i, pitch * (i // bx) + 5 * (i % bx) + k] = 1.0
        ss.append(m)
    return np.stack(ss), np.stack(ss).sum(0), pitch, out


def _kernel_seg(fv_ref, dsc_ref, s5_ref, sall_ref, out_ref, *, bx, pitch,
                out_cols):
    """Stripe-segment variant of _kernel: serialize each bx-cell segment
    of a gathered 128-lane stripe row into its own pitch-lane staging
    slot (prefix sums, spread targets, and the monotone log-shift all
    group-masked to segment boundaries).  bx == 128 degenerates to the
    chunk kernel's math exactly."""
    fv = fv_ref[:]  # (gr, Q) f32 scaled coefficients (live stripe thirds)
    dsc = dsc_ref[:]  # (gr, Q) i32 descriptors
    gr = fv.shape[0]

    lane = jax.lax.broadcasted_iota(I32, (gr, Q), 1)
    gl = lane % bx

    in_range = (fv >= jnp.float32(-2147483648.0)) & (
        fv < jnp.float32(2147483648.0)
    )
    trv = jnp.trunc(jnp.where(in_range, fv, 0.0))
    iv = jnp.where(in_range, trv.astype(I32), I32(tp.INT32_MIN))
    izero = iv == 0
    is_byte = (iv > -125) & (iv < 125)
    is_short = (iv >= -32768) & (iv <= 32767)
    is_i3 = (iv >= -8388608) & (iv <= 8388607)

    code = (
        izero.astype(I32)
        + (is_byte.astype(I32) << 4)
        + (is_short.astype(I32) << 8)
        + (is_i3.astype(I32) << 12)
    )
    l8 = lane % 8
    y = code
    for s in (1, 2, 4):
        y = y + jnp.where(l8 < 8 - s, pltpu.roll(y, Q - s, 1), 0)
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
    mode = jnp.where(l8 == 0, mode, 0)
    for s in (1, 2, 4):
        mode = mode | jnp.where(l8 >= s, pltpu.roll(mode, s, 1), 0)

    cost = dsc & 7
    rl = jax.lax.shift_right_logical(dsc, 4)
    lane0 = l8 == 0
    pb, ps, p3 = mode == 1, mode == 2, mode == 3
    member = izero
    cb_ = is_byte & ~izero
    cs_ = is_short & ~is_byte
    c3_ = is_i3 & ~is_short
    big = rl >= 256
    split = member & (cost == 5)
    fvb = jax.lax.bitcast_convert_type(fv, I32)

    def sel(*pairs_and_default):
        out = pairs_and_default[-1]
        for i in range(len(pairs_and_default) - 3, -1, -2):
            out = jnp.where(pairs_and_default[i], pairs_and_default[i + 1], out)
        return out

    plane0 = sel(
        pb, _byte(iv, 0),
        ps, jnp.where(lane0, _B_VLESC2_8X, _byte(iv, 0)),
        p3, jnp.where(lane0, _B_VLESC3_8X, _byte(iv, 0)),
        member, sel((rl == 1) & ~split, 0, big | split, _B_RLESC3, _B_RLESC1),
        cb_, _byte(iv, 0),
        cs_, _B_VLESC2,
        c3_, _B_VLESC3,
        _B_VLESC4,
    )
    plane1 = sel(
        ps, jnp.where(lane0, _byte(iv, 0), _byte(iv, 1)),
        p3, jnp.where(lane0, _byte(iv, 0), _byte(iv, 1)),
        member, _byte(rl, 0),
        cb_ | pb, 0,
        cs_ | c3_, _byte(iv, 0),
        _byte(fvb, 0),
    )
    plane2 = sel(
        ps, _byte(iv, 1),
        p3, jnp.where(lane0, _byte(iv, 1), _byte(iv, 2)),
        member, _byte(rl, 1),
        cs_ | c3_, _byte(iv, 1),
        _byte(fvb, 1),
    )
    plane3 = sel(
        p3, _byte(iv, 2),
        member, _byte(rl, 2),
        c3_, _byte(iv, 2),
        _byte(fvb, 2),
    )
    plane4 = sel(
        member, 0,
        _byte(fvb, 3),
    )

    # DEFAULT-precision one-hot spreads: byte operands (0..255) through
    # one-hot columns are exact in a single bf16 MXU pass (see _kernel's
    # round-5 note; this was +3.1 ms of the CI config's pack)
    lo = jax.lax.Precision.DEFAULT
    hi = jax.lax.Precision.HIGHEST
    s5 = s5_ref[:]  # (5, Q, out_cols) per-segment selection matrices
    staging = jnp.dot(plane0.astype(F32), s5[0],
                      preferred_element_type=F32, precision=lo)
    staging += jnp.dot(plane1.astype(F32), s5[1],
                       preferred_element_type=F32, precision=lo)
    staging += jnp.dot(plane2.astype(F32), s5[2],
                       preferred_element_type=F32, precision=lo)
    staging += jnp.dot(plane3.astype(F32), s5[3],
                       preferred_element_type=F32, precision=lo)
    staging += jnp.dot(plane4.astype(F32), s5[4],
                       preferred_element_type=F32, precision=lo)
    staging = staging.astype(I32)

    # per-byte move distances WITHIN each segment: off = segment-local
    # exclusive prefix of cost, dist[pitch*g + 5q + k] = 5q - off_q.
    # The dist-base dot is exact at DEFAULT only while its operands stay
    # inside bf16's integer range: base+1 <= 5*(bx-1)+1 <= 256 iff bx<=51
    ps_ = cost
    s = 1
    while s < bx:
        ps_ = ps_ + jnp.where(gl >= s, pltpu.roll(ps_, s, 1), 0)
        s *= 2
    off = ps_ - cost
    base = 5 * gl - off
    sall = sall_ref[:]
    pd = lo if 5 * (bx - 1) + 1 <= 256 else hi
    d0 = jnp.dot((base + 1).astype(F32), sall,
                 preferred_element_type=F32, precision=pd)
    cost5 = jnp.dot(cost.astype(F32), sall,
                    preferred_element_type=F32, precision=pd)
    ocols = jax.lax.broadcasted_iota(I32, (gr, out_cols), 1)
    u = ocols % pitch  # position within the segment's staging slot
    kcol = u % 5
    liv = (u < 5 * bx) & (kcol < cost5.astype(I32))
    dist = jnp.where(liv, d0.astype(I32) - 1, -1)

    # monotone log-shift front-pack, group-masked to pitch-lane segments
    x = staging
    s = 1
    while s < 5 * bx:
        guard = u < pitch - s
        inc_d = jnp.where(guard, pltpu.roll(dist, out_cols - s, 1), -1)
        inc_x = jnp.where(guard, pltpu.roll(x, out_cols - s, 1), 0)
        take = (inc_d >= 0) & ((inc_d & s) != 0)
        moveout = (dist >= 0) & ((dist & s) != 0)
        x = jnp.where(take, inc_x, x)
        dist = jnp.where(take, inc_d - s, jnp.where(moveout, -1, dist))
        s *= 2
    out_ref[:] = x


@functools.partial(jax.jit, static_argnames=("bx", "interpret"))
def pack_staging_seg(fv_rows, desc_rows, bx, interpret=False):
    """(A, 128) gathered live stripe thirds -> per-SEGMENT packed staging.

    Each input row holds 128//bx independent bx-cell segments (block
    columns of the volume-order stripe plane); the output row packs each
    segment's payload bytes front-aligned in its own SUBROW-aligned
    pitch-lane slot (values 0..255 in i32 lanes).  Segment s of row i
    thus occupies whole subrows — the XLA squeeze selects live ones
    directly.  Returns (A, (128//bx)*pitch) i32; pitch = ceil(5*bx/64)*64.
    """
    a, q = fv_rows.shape
    assert q == Q and Q % bx == 0
    gr = GR
    while a % gr:
        gr //= 2
    assert gr >= 8, f"row count {a} not a multiple of 8"
    s5, sall, pitch, out = _spread_matrices_seg(bx)
    return pl.pallas_call(
        functools.partial(_kernel_seg, bx=bx, pitch=pitch, out_cols=out),
        grid=(a // gr,),
        in_specs=[
            pl.BlockSpec((gr, Q), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gr, Q), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, Q, out), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gr, out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((a, out), jnp.int32),
        interpret=interpret,
    )(fv_rows, desc_rows, jnp.asarray(s5), jnp.asarray(sall))


@functools.partial(jax.jit, static_argnames=("interpret", "out_cols"))
def pack_staging(fv_rows, desc_rows, interpret=False, out_cols=SQ):
    """(A, 128) gathered scaled coeffs + descriptors -> packed
    (A, out_cols) i32.

    Each output row holds its chunk's payload bytes front-packed (values
    0..255 in int32 lanes); trailing slots are garbage.  `out_cols < SQ`
    writes only the leading slots — the skip_squeeze case (every active
    chunk fits one subrow) needs just SUBROW of the 640, saving ~8x of
    the output DMA.
    """
    a, q = fv_rows.shape
    assert q == Q and a % GR == 0
    s5, sall = _spread_matrices()
    out = pl.pallas_call(
        functools.partial(_kernel, out_cols=out_cols),
        grid=(a // GR,),
        in_specs=[
            pl.BlockSpec((GR, Q), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GR, Q), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, Q, SQ), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, SQ), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GR, out_cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((a, out_cols), jnp.int32),
        interpret=interpret,
    )(fv_rows, desc_rows, jnp.asarray(s5), jnp.asarray(sall))
    return out


# ---------------------------------------------------------------------------
# Tile-local flat compaction (round 5): the DENSE payload squeeze core.
#
# The final byte compaction of the stripe SEGMENT pack front-packs each
# live subrow's bytes into the dense container stream: ~22 XLA log-shift
# rounds over the (lcap*SUBROW,) staging, each materializing the values
# AND their i32 distances to HBM (~2.2 ms of the CI config's compress).
# This kernel runs a TILE-LOCAL compaction ((tile_rows, 128) blocks,
# fully independent grid steps) in one VMEM residency each; the caller
# finishes with a cheap cross-tile merge — after the kernel every tile
# is a dense byte run, so the remaining deficits are one partial row per
# tile boundary and the XLA finish compacts a ~payload-sized domain.
#
# Two tricks:
#   * value+distance pack into ONE i32 lane (dist<<8 | byte; dead = -1):
#     one roll per shift instead of two, half the VMEM footprint.
#     Distances are TILE-LOCAL (< tile_rows*128 <= 2^16): i32 headroom.
#   * a flat (1-D) shift by s over the (rows, 128) lane view is a lane
#     roll + a row roll (+ a row-carry select when s % 128 != 0; every
#     s = 2^k with k >= 7 is a pure sublane roll).
#
# A single-block whole-array variant (grid=(1,), one (28672, 128) block,
# full-width row iota) WEDGED the remote TPU worker at compile time —
# like the round-2 scalar-chase kernels, it never returned and took the
# chip down for the session.  Keep blocks at proven sizes (the fused
# tokenize-compact kernel rolls (1024, 128) tiles) and row iotas narrow.
# ---------------------------------------------------------------------------

TILE_ROWS = 512  # (512, 128) i32 tile = 256 KiB VMEM; rolls <= 511 rows


def _kernel_tilec(c_ref, o_ref, *, rounds):
    c = c_ref[:]  # (trc, 128) i32: local dist<<8 | byte, -1 dead
    trc = c.shape[0]
    lane = jax.lax.broadcasted_iota(I32, c.shape, 1)
    rowc = jax.lax.broadcasted_iota(I32, (trc, 1), 0)
    for k in range(rounds):
        s = 1 << k
        if s < Q:
            # flat left-shift by s: within-row part + next-row carry
            cp = pltpu.roll(c, Q - s, 1)
            cq = pltpu.roll(cp, trc - 1, 0)
            sel = lane < Q - s
            inc = jnp.where(sel, cp, cq)
            # flat positions past the tile end are dead
            inc = jnp.where((rowc == trc - 1) & ~sel, -1, inc)
        else:
            r = s // Q
            inc = pltpu.roll(c, trc - r, 0)
            inc = jnp.where(rowc >= trc - r, -1, inc)
        sbit = s << 8
        take = (inc >= 0) & ((inc & sbit) != 0)
        moveout = (c >= 0) & ((c & sbit) != 0)
        c = jnp.where(take, inc - sbit, jnp.where(moveout, -1, c))
    o_ref[:] = c


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def tile_compact(c, tile_rows=TILE_ROWS, interpret=False):
    """Front-pack each (tile_rows, 128) tile of a flat stream in VMEM.

    c: (m, 128) i32 lane view of the flat stream, each element packing
    (tile-LOCAL move-left distance << 8) | byte_value for live bytes and
    -1 for dead slots.  Within each tile distances must be non-decreasing
    over live elements (the front-pack invariant, ops/pack.py).  Returns
    the per-tile compacted view: each tile's live prefix holds dist==0
    packed values, its tail -1.  Tiles are independent grid steps.
    """
    m, q = c.shape
    assert q == Q and m % tile_rows == 0
    rounds = int(np.ceil(np.log2(tile_rows * Q)))
    return pl.pallas_call(
        functools.partial(_kernel_tilec, rounds=rounds),
        grid=(m // tile_rows,),
        in_specs=[
            pl.BlockSpec((tile_rows, Q), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, Q), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, Q), jnp.int32),
        interpret=interpret,
    )(c)
