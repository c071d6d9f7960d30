"""TPU-native entropy encoder: quantize + RLE/escape grammar, sparsify-then-pack.

The reference encoder (Run_Length_Encode_Slow.cpp:189-294) is a sequential
byte emitter with a mutable run-length register and a byte cursor.  On TPU
there are no byte-granular sequential stores, and element-granular gathers
run at ~0.1 Gelem/s (PERF_NOTES.md) — so the encoder is reformulated so that
every data-dependent movement happens at chunk-row granularity and all
variable-length packing uses the monotone log-shift primitive (ops/pack.py):

 PASS 1 — tokenize_desc, full-size, O(cells):
   quantize + classify every cell, pick the group-of-8 fast-path modes with
   the reference's exact selection guards (Run_Length_Encode_Slow.cpp:216,
   231,246), detect zero runs (hierarchical cummax with per-block carry;
   the run token lands on the run's LAST zero cell, matching the deferred
   EncodeRLE_Slow flush), and emit ONE packed int32 descriptor per cell:
   desc = cost(3b) | run_end(1b) | min(run_len, 2^24-1)(24b).
   Per-chunk byte counts, per-block sizes and the raw-fallback flags
   (stream > 4*cells -> raw block, CvxCompress.cpp:350-360) fall out of a
   row-sum.  Zero runs >= 2^24 split (cost-5 token [RLESC3 FFFFFF][0]).

 PASS 2 — pack_active, O(active chunks):
   chunks with zero payload bytes (interior of long zero runs, raw blocks)
   are dropped by log-shift compacting the chunk index list; only ACTIVE
   chunks are row-gathered.  Their 5 byte-planes are recomputed from the
   gathered coefficients + descriptors, interleaved into a cell-major
   (A, 5Q) staging, and front-packed per row by a 12-round log-shift
   (distance of byte (i,k) is 5i - off_i, monotone).  The packed rows are
   cut into 64-byte subrows and the live subrows are row-gathered into the
   final (L, 64) buffer — device->host traffic is ~1-2x the compressed
   size, never the raw size.

 HOST — assemble_payload: ragged concat of per-chunk payloads (numpy
   fancy-index, ∝ compressed bytes) + raw-block coefficient bytes ->
   the exact reference payload stream, block-ordered.

The emitted stream is byte-identical to the NumPy oracle encoder (and hence
to the reference grammar) — tested in tests/test_rle_device.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import pack, quant

I32 = jnp.int32
U8 = jnp.uint8

MAX_RUN24 = (1 << 24) - 1
SUBROW = 64
CHUNK_PACK = 128  # chunk width when pack gathers from a remapped layout

_B_RLESC1 = 127
_B_RLESC3 = 125
_B_VLESC2 = 0x83
_B_VLESC3 = 0x81
_B_VLESC4 = 0x80
_B_VLESC2_8X = 0x82
_B_VLESC3_8X = 0x7E


def chunk_cells(cells):
    """Chunk size Q: 128 cells, or the whole block when smaller.

    Q trades chunk-grid overhead against wasted staging in active chunks.
    Wavelet-coefficient sparsity is row-structured (nonzeros cluster at the
    low-x end of each (y,z) row), so fine chunks keep the active staging
    ∝ compressed size even for axis-degenerate fields (measured: Q=512
    marks every other chunk active on a z-only sinusoid; Q=128 tracks the
    true support).
    """
    return min(128, int(cells))


def _byte(v, k):
    """k-th little-endian byte of an int32 array, as int32 in [0,255]."""
    return jax.lax.shift_right_logical(v, jnp.int32(8 * k)) & 0xFF


def _sel(*pairs_and_default):
    """where-cascade: _sel(c1, v1, c2, v2, ..., default)."""
    out = pairs_and_default[-1]
    for i in range(len(pairs_and_default) - 3, -1, -2):
        out = jnp.where(pairs_and_default[i], pairs_and_default[i + 1], out)
    return out


def _classify(iv):
    """Nested size classes of quantized values (Run_Length_Encode_Slow.cpp)."""
    izero = iv == 0
    is_byte = (iv > -125) & (iv < 125)  # zero lanes count, as in ref :215
    is_short = (iv >= -32768) & (iv <= 32767)
    is_i3 = (iv >= -8388608) & (iv <= 8388607)
    return izero, is_byte, is_short, is_i3


def _group_modes(izero, is_byte, is_short, is_i3, shape2):
    """Group-of-8 fast-path mode per cell: 0 none / 1 byte / 2 short / 3 i24.

    One packed base-16 reshape-sum provides all four group counts
    (each count <= 8 fits a nibble); selection guards match the reference
    (:216 all-byte, :231 8x-short, :246 8x-int24).
    """
    n, c = shape2
    code = (
        izero.astype(I32)
        + (is_byte.astype(I32) << 4)
        + (is_short.astype(I32) << 8)
        + (is_i3.astype(I32) << 12)
    )
    g = code.reshape(n, c // 8, 8).sum(-1)
    nzero = g & 15
    nb = (g >> 4) & 15
    ns = (g >> 8) & 15
    n3 = (g >> 12) & 15
    nozero = nzero == 0
    allbyte = nozero & (nb == 8)
    allshort = nozero & ~allbyte & (ns == 8) & (nb + (8 - nb) * 3 > 17)
    alli3 = (
        nozero & ~allbyte & ~allshort & (n3 == 8)
        & (nb + (ns - nb) * 3 + (8 - ns) * 4 > 25)
    )
    mode = _sel(allbyte, 1, allshort, 2, alli3, 3, 0).astype(I32)
    mode = jnp.broadcast_to(mode[:, :, None], (n, c // 8, 8)).reshape(n, c)
    return mode


ROW = 32768  # tokenize compute-row width (measured sweet spot, PERF_NOTES.md)


def row_cells(cells):
    """Super-row width for the tokenize layout (divides cells)."""
    return min(ROW, int(cells))


def as_rows(coeffs2d):
    """(N, cells) -> (nrows, row) canonical tokenize compute layout."""
    n, c = coeffs2d.shape
    row = row_cells(c)
    return coeffs2d.reshape(n * (c // row), row)


def _run_structure(member, nblocks, rpb, row):
    """(run_end, run_len) with per-block reset, hierarchical cummax.

    Operates on the canonical (nrows, ROW) layout.  A run's token is
    attached to its LAST zero cell.  last-nonmember indices are computed
    per row (minor-axis cummax) and carried across the rows of the same
    block by a small cummax over the row axis (the TPU version of the
    encoder's sequential run register).
    """
    nrows = nblocks * rpb
    rib = (jnp.arange(nrows, dtype=I32) % rpb)[:, None]  # row-in-block
    idx = jnp.arange(row, dtype=I32)[None, :] + rib * row  # within-block
    lnm = jnp.where(member, I32(-1), idx)
    local = jax.lax.cummax(lnm, axis=1)
    row_max = local[:, -1].reshape(nblocks, rpb)
    carry = jax.lax.cummax(row_max, axis=1)
    carry = jnp.concatenate(
        [jnp.full((nblocks, 1), -1, I32), carry[:, :-1]], axis=1
    ).reshape(nrows, 1)
    lastnm = jnp.where(local == -1, carry, local)

    # next cell's membership, looking across the row boundary (but not
    # across block boundaries: each block's trailing run ends at its end)
    nxt_first = jnp.concatenate(
        [member[1:, :1], jnp.zeros((1, 1), dtype=bool)], axis=0
    )
    last_of_block = (rib == rpb - 1)[:, :1]
    nxt = jnp.concatenate(
        [member[:, 1:], jnp.where(last_of_block, False, nxt_first)], axis=1
    )
    run_end = member & ~nxt
    run_len = idx - lastnm
    return run_end, run_len


def _cost(mode, izero, is_byte, is_short, is_i3, run_end, run_len):
    """Per-cell emission size in bytes (0 for non-final zeros)."""
    lane0 = (jnp.arange(izero.shape[-1], dtype=I32) % 8 == 0)[None, :]
    cb = is_byte & ~izero
    cs = is_short & ~is_byte
    c3 = is_i3 & ~is_short
    runcost = _sel(
        run_len == 1, 1,
        run_len < 256, 2,
        run_len <= MAX_RUN24, 4,
        5,  # split case: [RLESC3 FFFFFF][0]
    )
    return _sel(
        mode == 1, 1,
        mode == 2, jnp.where(lane0, 3, 2),
        mode == 3, jnp.where(lane0, 4, 3),
        izero, jnp.where(run_end, runcost, 0),
        cb, 1,
        cs, 3,
        c3, 4,
        5,
    ).astype(I32)


@functools.partial(jax.jit, static_argnames=("nblocks", "chunk"))
def tokenize_desc(fv_rows, nblocks, chunk):
    """PASS 1: per-cell descriptors + per-chunk/per-block byte accounting.

    fv_rows (nrows, row) f32: PRE-SCALED coefficients (mulfac * coeff) in
    the canonical compute layout (`as_rows`); chunk static (divides
    cells).  Returns:
      desc        (N*cells//chunk, chunk) int32   cost|run_end|run_len
      chunk_bytes (N*cells//chunk,)       int32   0 for raw blocks
      sizes       (N,) int32   per-block payload size (4*cells when raw)
      raw         (N,) bool    raw-fallback flag (CvxCompress.cpp:350-360)

    PERFORMANCE: call this in its OWN jit with `coeffs` produced by a
    DIFFERENT jit whose output is already (nrows, row_cells) — in-jit
    layout changes between the wavelet einsum output and this compute
    layout trigger pathological XLA relayouts (measured 10-25x slowdowns,
    PERF_NOTES.md); across jit boundaries they are near-free.  The codec
    drives the stages as separate jits for exactly this reason.
    """
    n = nblocks
    nrows, row = fv_rows.shape
    rpb = nrows // n
    c = rpb * row
    assert c % chunk == 0 and chunk % 8 == 0
    ncpb = c // chunk
    nchunks = n * ncpb
    _, iv = quant.quantize(fv_rows, jnp.float32(1.0))
    izero, is_byte, is_short, is_i3 = _classify(iv)
    mode = _group_modes(izero, is_byte, is_short, is_i3, (nrows, row))
    run_end, run_len = _run_structure(izero, n, rpb, row)
    cost = _cost(mode, izero, is_byte, is_short, is_i3, run_end, run_len)

    desc = (
        cost
        | (run_end.astype(I32) << 3)
        | (jnp.minimum(run_len, MAX_RUN24) << 4)
    )

    chunk_bytes = cost.reshape(n, ncpb, chunk).sum(-1)
    sizes0 = chunk_bytes.sum(-1)
    raw = sizes0 > 4 * c
    sizes = jnp.where(raw, I32(4 * c), sizes0)
    chunk_bytes = jnp.where(raw[:, None], I32(0), chunk_bytes)
    # counts for host capacity planning: an 8-byte readback instead of the
    # full (nchunks,) table (d2h of computed results costs ~30 MB/s + one
    # ~30ms round trip through the tunnel; see PERF_NOTES.md)
    active = chunk_bytes > 0
    acount = active.sum(dtype=I32)
    lcount = ((chunk_bytes + (SUBROW - 1)) // SUBROW).sum(dtype=I32)
    counts = jnp.stack([acount, lcount])
    return (
        desc.reshape(nchunks, chunk),
        chunk_bytes.reshape(nchunks),
        sizes,
        raw,
        counts,
    )


def _planes(cf, iv, fv, desc, mode, izero, is_byte, is_short, is_i3):
    """The 5 byte-planes of every cell's <=5-byte token (active rows only).

    Byte values replicate the oracle/reference grammar exactly
    (Run_Length_Escape_Codes.hxx:8-14); packed groups decompose per lane
    (VLESC2_8x = lane0 [code,i16] + lanes1..7 [i16], byte-identical).
    """
    cost = desc & 7
    run_end = (desc >> 3) & 1
    rl = jax.lax.shift_right_logical(desc, 4)
    lane0 = (jnp.arange(iv.shape[-1], dtype=I32) % 8 == 0)[None, :]
    pb, ps, p3 = mode == 1, mode == 2, mode == 3
    member = izero
    cb = is_byte & ~izero
    cs = is_short & ~is_byte
    c3 = is_i3 & ~is_short
    big = rl >= 256
    split = member & (cost == 5)

    fvb = jax.lax.bitcast_convert_type(fv, I32)

    plane0 = _sel(
        pb, _byte(iv, 0),
        ps, jnp.where(lane0, _B_VLESC2_8X, _byte(iv, 0)),
        p3, jnp.where(lane0, _B_VLESC3_8X, _byte(iv, 0)),
        member, _sel((rl == 1) & ~split, 0, big | split, _B_RLESC3, _B_RLESC1),
        cb, _byte(iv, 0),
        cs, _B_VLESC2,
        c3, _B_VLESC3,
        _B_VLESC4,
    )
    plane1 = _sel(
        ps, jnp.where(lane0, _byte(iv, 0), _byte(iv, 1)),
        p3, jnp.where(lane0, _byte(iv, 0), _byte(iv, 1)),
        member, _byte(rl, 0),
        cb | pb, 0,
        cs | c3, _byte(iv, 0),
        _byte(fvb, 0),
    )
    plane2 = _sel(
        ps, _byte(iv, 1),  # only read for lane0 (cost 3)
        p3, jnp.where(lane0, _byte(iv, 1), _byte(iv, 2)),
        member, _byte(rl, 1),
        cs | c3, _byte(iv, 1),
        _byte(fvb, 1),
    )
    plane3 = _sel(
        p3, _byte(iv, 2),  # only read for lane0 (cost 4)
        member, _byte(rl, 2),
        c3, _byte(iv, 2),
        _byte(fvb, 2),
    )
    plane4 = _sel(
        member, 0,  # split-run trailing single zero
        _byte(fvb, 3),
    )
    return plane0, plane1, plane2, plane3, plane4, cost


def _fit(a, cap, fill=0):
    """Static slice-or-pad of a 1-D array to length cap."""
    n = a.shape[0]
    if cap <= n:
        return a[:cap]
    pad = jnp.full((cap - n,), fill, dtype=a.dtype)
    return jnp.concatenate([a, pad])


def _gather_from_planes(fvv, desc, aidx, acap, plane_geom,
                        use_kernel=True):
    """Active-chunk rows (acap, 128) from VOLUME-ORDER planes (stripe).

    A block-major chunk is an (rpc, bx) patch of the plane: rpc
    consecutive rows x one bx-lane window.  On TPU: gather each chunk's
    whole (rpc, W) patch group in ONE take (6-KB contiguous rows — the
    fast row-gather class), then extract/compose the chunk row in a
    Pallas kernel (static lane shifts + selects — exact for any dtype).
    """
    vol_shape3, blk = plane_geom
    nz, ny, nx = vol_shape3
    bx, by, bz = blk
    nbz, nby, nbx = -(-nz // bz), -(-ny // by), -(-nx // bx)
    from . import wavelet as _wav

    nbx2 = _wav.padded_nbx(nbx, bx)
    W = nbx2 * bx
    xt = W // 128
    rpc = 128 // bx  # rows per chunk == windows per 128-lane view row
    ypr = by // rpc
    cpb = (bx * by * bz) // 128
    nyp = nby * by

    b = aidx // cpb
    w = aidx % cpb
    bzi = b // (nby * nbx)
    byi = (b // nbx) % nby
    bxi = b % nbx
    zl = w // ypr
    yq = w % ypr
    pr = (bzi * bz + zl) * nyp + byi * by + yq * rpc
    if use_kernel:
        # ONE take per plane of whole (rpc, W) chunk patches (6-KB-class
        # contiguous rows gather ~4x faster than rpc separate 512-B
        # rows), then a Pallas extract to chunk-major rows
        from . import pack_pallas

        R = fvv.shape[0]
        grp = pr // rpc  # pr % rpc == 0 by stripe_path_ok geometry
        g4f = jnp.take(
            fvv.reshape(R // rpc, rpc, xt, 128), grp, axis=0
        )
        g4d = jnp.take(
            desc.reshape(R // rpc, rpc, xt, 128), grp, axis=0
        )
        return pack_pallas.patch_extract(
            g4f, g4d, bxi[:, None], bx, rpc, xt
        )

    # XLA fallback (CPU): narrow (.., bx)-minor gather — correct; the 4x
    # lane-padding tax only matters on real TPUs, which take the kernel
    r32 = (
        (pr[:, None] + jnp.arange(rpc, dtype=I32)[None, :]) * (W // bx)
        + bxi[:, None]
    )
    gf = jnp.take(fvv.reshape(-1, bx), r32.reshape(-1), axis=0)
    gd = jnp.take(desc.reshape(-1, bx), r32.reshape(-1), axis=0)
    return gf.reshape(acap, 128), gd.reshape(acap, 128)


@functools.partial(
    jax.jit,
    static_argnames=(
        "acap", "lcap", "use_pallas_kernel", "skip_squeeze", "row_of_chunk",
        "desc_row_of_chunk", "nchunks_override", "plane_geom",
    ),
)
def pack_active(fv_chunks, desc, chunk_bytes, acap, lcap,
                use_pallas_kernel=None, skip_squeeze=False,
                row_of_chunk=None, desc_row_of_chunk=None,
                nchunks_override=None, plane_geom=None):
    """PASS 2: row-gather active chunks, pack their payload bytes.

    fv_chunks (nchunks, chunk) f32: PRE-SCALED coefficients in chunk
    layout (same jit-output layout rule as tokenize_desc),
    desc/chunk_bytes from tokenize_desc.  acap/lcap: static buckets >=
    the active-chunk / live-subrow counts (host-chosen).  Returns
    (subrows (lcap, SUBROW) u8, aidx, abytes); live subrows hold the
    per-chunk payloads, front-packed, in block order.

    `row_of_chunk` / `desc_row_of_chunk` (optional, elementwise): map
    chunk ids to rows of `fv_chunks` / `desc` when those live in a
    different layout (the direct-volume planes).  A map may return
    (n, k) indices of width chunk//k rows per chunk — gathers stay
    row-granular either way.  `nchunks_override` gives the chunk count
    when `desc` is not chunk-major.

    `plane_geom=(vol_shape3, block)` (stripe fast path): fv_chunks and
    desc are the VOLUME-ORDER planes (nzp*nyp, W).  Active chunks are
    gathered as FULL 128-lane rows of the (R*xt, 128) view and the
    bx-lane windows are extracted/recomposed with static lane shifts —
    the (.., bx)-minor narrow gather this replaces was 4x lane-padded
    and cost ~5x the whole block-major pack stage (round 3).
    """
    chunk = CHUNK_PACK if nchunks_override is not None else desc.shape[1]
    nchunks = (
        nchunks_override if nchunks_override is not None else desc.shape[0]
    )
    spq = 5 * chunk // SUBROW  # subrows per chunk staging row

    # -- active-chunk scalar compaction (index + bytes stacked into one
    # 2-row array: halves the kernel launches of the log-shift rounds)
    live = chunk_bytes > 0
    cidx = jnp.arange(nchunks, dtype=I32)
    stacked = jnp.stack([cidx, chunk_bytes])
    packed2, count2 = pack.compact_live(
        (stacked,), jnp.broadcast_to(live, (2, nchunks)),
        pack.ceil_log2(nchunks),
    )
    count = count2[0]
    aidx = _fit(
        jnp.where(jnp.arange(nchunks, dtype=I32) < count, packed2[0][0], 0),
        acap,
    )
    abytes = _fit(
        jnp.where(jnp.arange(nchunks, dtype=I32) < count, packed2[0][1], 0),
        acap,
    )

    # -- row-gather active chunks (row-granular: fast on TPU)
    if plane_geom is not None:
        from . import pack_pallas as _pp

        kern_ok = (
            use_pallas_kernel
            if use_pallas_kernel is not None
            else _pp.available()
        )
        fvg, dsc = _gather_from_planes(
            fv_chunks, desc, aidx, acap, plane_geom, use_kernel=kern_ok
        )
    else:
        def _gather(mat, rmap):
            rows = rmap(aidx) if rmap is not None else aidx
            g = jnp.take(mat, rows.reshape(-1), axis=0)
            return g.reshape(acap, chunk)

        fvg = _gather(fv_chunks, row_of_chunk)
        dsc = _gather(desc, desc_row_of_chunk)

    # -- rebuild token bytes + front-pack, Pallas kernel when available
    from . import pack_pallas

    if use_pallas_kernel is None:
        use_pallas_kernel = pack_pallas.available()
    if (
        use_pallas_kernel
        and chunk == pack_pallas.Q
        and acap % pack_pallas.GR == 0
    ):
        if skip_squeeze:
            # every active chunk fits one subrow: emit only the leading
            # lanes (the kernel still front-packs the full staging)
            packed = pack_pallas.pack_staging(
                fvg, dsc, out_cols=pack_pallas.Q
            ).astype(U8)
            return packed[:, :SUBROW], aidx, abytes
        packed = pack_pallas.pack_staging(fvg, dsc).astype(U8)
        return _subrow_squeeze(packed, abytes, acap, lcap, chunk, aidx)

    fv, iv = quant.quantize(fvg, jnp.float32(1.0))
    izero, is_byte, is_short, is_i3 = _classify(iv)
    mode = _group_modes(izero, is_byte, is_short, is_i3, (acap, chunk))
    p0, p1, p2, p3_, p4, cost = _planes(
        fvg, iv, fv, dsc, mode, izero, is_byte, is_short, is_i3
    )

    # -- cell-major staging (A, 5Q) and monotone front-pack
    staging = jnp.stack(
        [p.astype(U8) for p in (p0, p1, p2, p3_, p4)], axis=-1
    ).reshape(acap, 5 * chunk)
    off = jnp.cumsum(cost, axis=1) - cost
    base = 5 * jnp.arange(chunk, dtype=I32)[None, :] - off  # dist per cell
    kio = jnp.arange(5, dtype=I32)[None, None, :]
    livb = kio < cost[:, :, None]
    ddt = jnp.int16 if 5 * chunk <= 32767 else I32  # halve logshift traffic
    dist = jnp.where(
        livb, jnp.broadcast_to(base[:, :, None], (acap, chunk, 5)), -1
    ).astype(ddt).reshape(acap, 5 * chunk)
    packed, _ = pack.compact_rows(staging, dist, pack.ceil_log2(5 * chunk))
    if skip_squeeze:
        # every live entry has exactly one subrow (acount == lcount): the
        # squeeze is the identity on the first SUBROW columns
        return packed[:, :SUBROW], aidx, abytes
    return _subrow_squeeze(packed, abytes, acap, lcap, chunk, aidx)


def seg_block_order_ok(plane_geom):
    """True when the stripe seg pack can emit the payload in CONTAINER
    BLOCK ORDER on device (pack_active_stripe_seg's argsort path): the
    per-subrow sort key borank*spseg + spi must fit i32.  False only for
    volumes beyond ~2^30 subrow slots (~6.8 G cells at 32³ blocks —
    past single-chip HBM; the sharded layer splits those), which use the
    per-subrow-metadata path + host reorder instead.

    Block-order emission exists because per-subrow metadata DOMINATED
    the compress d2h at high ratios (config A: 459 KB of metadata
    around a 163 KB payload; the tunnel moves computed buffers at
    ~24 MB/s, so metadata alone cost ~10 ms/vol — measured round 4)."""
    (nz, ny, nx), (bx, by, bz) = plane_geom
    from . import wavelet as _wav

    nbz, nby, nbx = -(-nz // bz), -(-ny // by), -(-nx // bx)
    nbx2 = _wav.padded_nbx(nbx, bx)
    pitch = -(-5 * bx // SUBROW) * SUBROW
    spseg = pitch // SUBROW
    return nbz * bz * nby * by * nbx2 * spseg < (1 << 30)


@functools.partial(
    jax.jit,
    static_argnames=("tcap", "lcap", "bcap", "plane_geom"),
)
def pack_active_stripe_seg(fv3, d3, cbrow, raw, tcap, lcap, bcap,
                           plane_geom):
    """PASS 2 for the bx<128 stripe path, SEGMENT-granular (round 3).

    Replaces the gather-bound (rpc, bx)-patch recomposition (measured
    ~10-16 ms at the CI config, PERF_NOTES round 3 #2): the pack unit
    becomes the SEGMENT — one stripe row's bx cells of one block column —
    so active data is fetched as plain 128-lane row gathers of the
    plane's (R*T, 128) "thirds" view and never recomposed to chunk-major
    at all.  The container stream is unchanged: a block's payload is the
    concat of its segments in (z, y) row order, which the host assembly
    emits from per-segment spans (assemble_payload_segments).

    fv3 / d3: the scaled-coefficient and descriptor planes viewed as
    (R*T, 128) (reshaped at a jit boundary — the codec does this
    eagerly); cbrow (R, NL) per-(row, block-column) byte counts from the
    stripe tokenize kernel; raw (nnn,) bool.  tcap/lcap: host-chosen
    buckets for live thirds / live subrows (from the stripe counts
    readback).

    Default (seg_block_order_ok geometries): the DENSE payload stream
    comes out in CONTAINER BLOCK ORDER — each segment's block-order rank
    is a closed-form function of its (row, block-column) coordinates, so
    the live subrows sort by that key (argsort of lcap i32 keys: ~0.1 ms
    at 64 k, measured round 4) BEFORE the byte compaction.  The host
    then needs NO per-subrow metadata at all (the bundle's per-block
    sizes locate every block), which deletes ~60% of the compress d2h at
    high compression ratios.  Returns (stream (bcap,) u8, (1,) dummy,
    (1,) dummy).

    Fallback (giant volumes whose sort key would overflow i32): stream
    in stripe-row-major segment order plus per-SUBROW metadata lsid/lsb
    (owning segment id / its byte count); the host groups segments by
    block with a stable argsort (assemble_payload_segments).
    """
    from . import pack_pallas, wavelet as _wav

    vol_shape3, blk = plane_geom
    nz, ny, nx = vol_shape3
    bx, by, bz = blk
    nbz, nby, nbx = -(-nz // bz), -(-ny // by), -(-nx // bx)
    nbx2 = _wav.padded_nbx(nbx, bx)
    rpc = 128 // bx
    T = nbx2 // rpc
    R = nbz * bz * nby * by
    pitch = -(-5 * bx // SUBROW) * SUBROW
    spseg = pitch // SUBROW

    cbm = _masked_seg_bytes(cbrow, raw, vol_shape3, blk)
    cb_t3 = cbm.reshape(R * T, rpc)

    # live-third compaction + row gathers (row-granular, 128-lane rows)
    tlive = jnp.any(cb_t3 > 0, axis=1)
    (tpk,), tcount = pack.compact_live(
        (jnp.arange(R * T, dtype=I32),), tlive, pack.ceil_log2(R * T)
    )
    tidx = _fit(jnp.where(jnp.arange(R * T, dtype=I32) < tcount, tpk, 0),
                tcap)
    trow = jnp.arange(tcap, dtype=I32)
    gf = jnp.take(fv3, tidx, axis=0)
    gd = jnp.take(d3, tidx, axis=0)
    gcb = jnp.where(
        (trow < tcount)[:, None], jnp.take(cb_t3, tidx, axis=0), 0
    )

    packed = pack_pallas.pack_staging_seg(gf, gd, bx).astype(U8)

    block_order = seg_block_order_ok(plane_geom)
    sb_flat = gcb.reshape(tcap * rpc)
    sid_flat = (tidx[:, None] * rpc
                + jnp.arange(rpc, dtype=I32)[None, :]).reshape(tcap * rpc)
    nsub = (sb_flat + (SUBROW - 1)) // SUBROW  # <= spseg by construction
    nsr = tcap * rpc * spseg
    sub_live = (
        jnp.arange(spseg, dtype=I32)[None, :] < nsub[:, None]
    ).reshape(nsr)
    spi = jnp.arange(spseg, dtype=I32)[None, :]
    sub_bytes = jnp.clip(
        sb_flat[:, None] - spi * SUBROW, 0, SUBROW
    ).reshape(nsr)  # live bytes within each subrow
    if block_order:
        # CLOSED-FORM container rank of each segment: sid encodes
        # (r, g) = (z-slice-major row, padded block column); the
        # container orders blocks by (zb, yb, g) and a block's payload
        # by (dz, dy) (CvxCompress.cpp:302,321-328 — x fastest block id,
        # per-block stream in scan order).  Phantom columns (g >= nbx)
        # and raw blocks never have live subrows, so ranking with nbx2
        # strides preserves the container's relative order.
        nyp = nby * by
        r_of = sid_flat // nbx2
        g_of = sid_flat % nbx2
        zsl, yy = r_of // nyp, r_of % nyp
        zb_of, dz_of = zsl // bz, zsl % bz
        yb_of, dy_of = yy // by, yy % by
        borank = (((zb_of * nby + yb_of) * nbx2 + g_of) * bz + dz_of) \
            * by + dy_of
        meta_row = borank * spseg  # + spi per subrow slot below
    else:
        meta_row = sid_flat
    # ONE compaction over the subrow domain carries the subrow index,
    # the sort key (or segment id), and the subrow's live bytes (the
    # block-order path drops the segment-bytes row — unused there).
    # Round 5: the subrow index (< nsr < 2^24 whenever block order is
    # legal) and its live bytes (<= SUBROW, 7 bits) pack into ONE i32
    # row, so the block-order compaction carries 2 rows instead of 3 —
    # compaction traffic scales with carried rows.
    key2d = meta_row[:, None] + (spi if block_order else 0)
    pack_ib = block_order and nsr < (1 << 24)
    if pack_ib:
        idx_row = jnp.arange(nsr, dtype=I32) * 128 + sub_bytes
    else:
        idx_row = jnp.arange(nsr, dtype=I32)
    rows = [
        idx_row,
        jnp.broadcast_to(key2d, (tcap * rpc, spseg)).reshape(nsr),
    ]
    if not pack_ib:
        rows.append(sub_bytes)
    if not block_order:
        rows.insert(2, jnp.broadcast_to(
            sb_flat[:, None], (tcap * rpc, spseg)
        ).reshape(nsr))
    stacked = jnp.stack(rows)
    nrows = stacked.shape[0]
    packed2, count2 = pack.compact_live(
        (stacked,), jnp.broadcast_to(sub_live, (nrows, nsr)),
        pack.ceil_log2(nsr),
    )
    lcount = count2[0]
    live = jnp.arange(nsr, dtype=I32) < lcount
    if pack_ib:
        ib = jnp.where(live, packed2[0][0], 0)
        lidx = _fit(ib // 128, lcap)
        blive = _fit(ib % 128, lcap)
    else:
        lidx = _fit(jnp.where(live, packed2[0][0], 0), lcap)
        blive = _fit(jnp.where(live, packed2[0][nrows - 1], 0), lcap)
    if block_order:
        imax = jnp.iinfo(I32).max
        key = _fit(jnp.where(live, packed2[0][1], imax), lcap, fill=imax)
        perm = jnp.argsort(key)  # dead rows (key=i32max) sort last
        lidx = jnp.take(lidx, perm)
        blive = jnp.take(blive, perm)
        lsid = jnp.zeros((1,), I32)
        lsb = jnp.zeros((1,), I32)
    else:
        lsid = _fit(jnp.where(live, packed2[0][1], -1), lcap, fill=-1)
        lsb = _fit(jnp.where(live, packed2[0][2], 0), lcap)
    subrows = jnp.take(packed.reshape(nsr, SUBROW), lidx, axis=0)

    # byte-compact the subrow staging into the DENSE payload stream
    # (round 3): segments average a few bytes, so the subrow staging is
    # ~10x the live payload — d2h (and the host's assembly source)
    # shrink to ~compressed size.  Round 5: every live byte of subrow i
    # moves by the SAME distance (SUBROW*i - off_i, off = exclusive
    # prefix of blive — within a subrow the live bytes are already a
    # front-packed prefix), so value+distance pack into one i32 lane and
    # the whole ~22-round log-shift runs in ONE VMEM residency
    # (pack_pallas.flat_compact) instead of ~22 HBM round trips (~2.2 ms
    # of the CI config's compress).
    dom = lcap * SUBROW
    m = dom // 128
    trc = pack_pallas.TILE_ROWS
    while trc > 8 and m % trc:
        trc //= 2
    if dom % 128 == 0 and m % trc == 0 and m >= trc and trc >= 8:
        # tile-local Pallas compaction + row-granular cross-tile merge:
        # every live byte of subrow i moves by the same distance
        # (SUBROW*i - off_i; within a subrow the live bytes are already a
        # front-packed prefix), so value+distance pack into one i32 lane
        # and each (trc, 128) tile compacts in ONE VMEM residency.
        # After the kernel each tile is a dense run: the cross-tile
        # deficits are one partial 128-byte row per tile, so the XLA
        # finish gathers the ~payload-sized dense prefixes at 128-byte
        # ROW granularity and compacts a tiny domain.
        spt = trc * 128 // SUBROW  # subrows per tile
        off = jnp.cumsum(blive) - blive
        off2 = off.reshape(-1, spt)
        ldist = (
            jnp.arange(spt, dtype=I32)[None, :] * SUBROW
            - (off2 - off2[:, :1])
        ).reshape(lcap)
        cpk = jnp.where(
            jnp.arange(SUBROW, dtype=I32)[None, :] < blive[:, None],
            (ldist[:, None] << 8) | subrows.astype(I32),
            -1,
        )
        cpk = pack_pallas.tile_compact(cpk.reshape(m, 128), trc)
        vals = jnp.where(cpk >= 0, cpk & 255, 0).astype(U8)
        # per-tile live bytes -> per-row live bytes of the dense prefixes
        kt = jnp.sum(blive.reshape(-1, spt), axis=1)  # (ntiles,)
        rowbytes = jnp.clip(
            kt[:, None] - 128 * jnp.arange(trc, dtype=I32)[None, :], 0, 128
        ).reshape(m)
        ntiles = m // trc
        rcap = -(-(-(-bcap // 128) + ntiles) // 8) * 8
        (rpk,), rcount = pack.compact_live(
            (jnp.stack([jnp.arange(m, dtype=I32), rowbytes]),),
            jnp.broadcast_to(rowbytes > 0, (2, m)),
            pack.ceil_log2(m),
        )
        rlive = jnp.arange(m, dtype=I32) < rcount[0]
        ridx = _fit(jnp.where(rlive, rpk[0], 0), rcap)
        rb = _fit(jnp.where(rlive, rpk[1], 0), rcap)
        grows = jnp.take(vals, ridx, axis=0)  # (rcap, 128) u8 rows
        # final deficit compaction: distances accumulate only at tile
        # boundaries (< 128 per tile), so few rounds over ~payload bytes
        bmask = (
            jnp.arange(128, dtype=I32)[None, :] < rb[:, None]
        ).reshape(rcap * 128)
        (bs,), bcount = pack.compact_live(
            (grows.reshape(rcap * 128),), bmask,
            pack.ceil_log2(128 * ntiles),
        )
        stream = _fit(
            jnp.where(jnp.arange(rcap * 128, dtype=I32) < bcount, bs, 0),
            bcap,
        ).astype(U8)
    else:
        bmask = (
            jnp.arange(SUBROW, dtype=I32)[None, :] < blive[:, None]
        ).reshape(dom)
        (bs,), bcount = pack.compact_live(
            (subrows.reshape(dom),), bmask, pack.ceil_log2(dom)
        )
        stream = _fit(
            jnp.where(jnp.arange(dom, dtype=I32) < bcount, bs, 0),
            bcap,
        ).astype(U8)
    return stream, lsid, lsb


def _masked_seg_bytes(cbrow, raw, vol_shape3, blk):
    """(R, nbx2) per-segment byte counts with phantom x-pad columns and
    raw-fallback blocks' segments zeroed (shared by the stripe tokenize
    counts and the segment pack)."""
    from . import wavelet as _wav

    nz, ny, nx = vol_shape3
    bx, by, bz = blk
    nbz, nby, nbx = -(-nz // bz), -(-ny // by), -(-nx // bx)
    nbx2 = _wav.padded_nbx(nbx, bx)
    R = nbz * bz * nby * by
    cb12 = cbrow[:, :nbx2]
    raw3 = jnp.pad(
        raw.reshape(nbz, nby, nbx), ((0, 0), (0, 0), (0, nbx2 - nbx)),
        constant_values=True,  # phantom columns masked like raw blocks
    )
    rawm = jnp.broadcast_to(
        raw3[:, None, :, None, :], (nbz, bz, nby, by, nbx2)
    ).reshape(R, nbx2)
    return jnp.where(rawm, 0, cb12)


def stripe_seg_counts(cbrow, raw, vol_shape3, blk):
    """Device scalars [live thirds, live segments, live subrows] for the
    segment pack's capacity planning (computed inside the stripe tokenize
    producer jit; an extra 12-byte readback alongside the chunk counts)."""
    from . import wavelet as _wav

    bx = blk[0]
    rpc = 128 // bx
    pitch = -(-5 * bx // SUBROW) * SUBROW
    cbm = _masked_seg_bytes(cbrow, raw, vol_shape3, blk)
    R2 = cbm.shape[0] * cbm.shape[1] // rpc
    cb_t3 = cbm.reshape(R2, rpc)
    tcount = jnp.any(cb_t3 > 0, axis=1).sum(dtype=I32)
    scount = (cbm > 0).sum(dtype=I32)
    slcount = ((cbm + (SUBROW - 1)) // SUBROW).sum(dtype=I32)
    pbytes = cbm.sum(dtype=I32)  # live payload bytes (stream cap)
    return jnp.stack([tcount, scount, slcount, pbytes])


def assemble_payload_blockorder(stream_h, sizes_h, raw_h, raw_bytes_h,
                                cells):
    """Host: container payload from a BLOCK-ORDERED device stream.

    The seg pack's default path (seg_block_order_ok) emits the dense
    payload already in container block order, so with no raw-fallback
    blocks the device stream IS the payload — zero host reordering.
    Raw blocks (absent from the device stream) splice in as the stream's
    non-raw runs shift right past each raw span.
    """
    sizes = np.asarray(sizes_h, dtype=np.int64)
    raw = np.asarray(raw_h, dtype=bool)
    total = int(sizes.sum())
    flat = np.ascontiguousarray(stream_h, dtype=np.uint8).reshape(-1)
    if not raw.any():
        return flat[:total], total
    out = np.empty(total, dtype=np.uint8)
    block_base = np.cumsum(sizes) - sizes
    nr_sizes = np.where(raw, 0, sizes)
    src_base = np.cumsum(nr_sizes) - nr_sizes
    # contiguous runs of non-raw blocks copy as single spans (raw
    # fallback is rare: usually zero, worst case a handful of blocks)
    nr = np.flatnonzero(~raw)
    if nr.size:
        run_first = np.r_[True, np.diff(nr) != 1]
        starts = nr[run_first]
        run_id = np.cumsum(run_first) - 1
        run_bytes = np.bincount(run_id, weights=nr_sizes[nr]).astype(
            np.int64
        )
        for b, n in zip(starts, run_bytes):
            d0, s0 = block_base[b], src_base[b]
            out[d0:d0 + n] = flat[s0:s0 + n]
    rb = np.ascontiguousarray(raw_bytes_h, dtype=np.uint8)
    for i, b in enumerate(np.nonzero(raw)[0]):
        out[block_base[b]:block_base[b] + 4 * cells] = rb[i]
    return out, total


def assemble_payload_segments(subrows_h, lsid_h, lsb_h, slcount, sizes_h,
                              raw_h, raw_bytes_h, cells, blk, vol_shape3):
    """Host: ragged concat from per-SUBROW metadata (stripe seg path,
    the giant-volume fallback — see seg_block_order_ok).

    `lsid_h`/`lsb_h` carry each live subrow's owning segment id and that
    segment's byte count (pack_active_stripe_seg); a segment's subrows
    are consecutive, so segment spans fall out of where lsid changes.
    Segments arrive in stripe-row-major order (r-major, then block
    column); the container needs block order.  A stable argsort by block
    id groups them while preserving the within-block (z, y) row order —
    everything here is ∝ live segments (∝ compressed size).
    """
    sizes = np.asarray(sizes_h, dtype=np.int64)
    raw = np.asarray(raw_h, dtype=bool)
    lsid = np.asarray(lsid_h[:slcount], dtype=np.int64)
    lsb = np.asarray(lsb_h[:slcount], dtype=np.int64)
    if slcount:
        first = np.empty(slcount, dtype=bool)
        first[0] = True
        np.not_equal(lsid[1:], lsid[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        sid = lsid[starts]
        sb = lsb[starts]
    else:
        starts = np.empty(0, np.int64)
        sid = np.empty(0, np.int64)
        sb = np.empty(0, np.int64)
    scount = sid.size

    total = int(sizes.sum())
    stream = np.empty(total, dtype=np.uint8)
    block_base = np.cumsum(sizes) - sizes

    if scount:
        nz, ny, nx = vol_shape3
        bx, by, bz = blk
        nbz, nby, nbx = -(-nz // bz), -(-ny // by), -(-nx // bx)
        from . import wavelet as _wav

        nbx2 = _wav.padded_nbx(nbx, bx)
        nyp = nby * by

        # the device stream is byte-dense in segment arrival order
        src = np.cumsum(sb) - sb

        r = sid // nbx2
        g = sid % nbx2  # < nbx (phantom/raw segments carry 0 bytes)
        blkid = (r // nyp // bz) * (nby * nbx) + (r % nyp // by) * nbx + g
        order = np.argsort(blkid, kind="stable")
        blk_s, sb_s, src_s = blkid[order], sb[order], src[order]

        excl = np.cumsum(sb_s) - sb_s
        first = np.empty(len(order), dtype=bool)
        first[0] = True
        np.not_equal(blk_s[1:], blk_s[:-1], out=first[1:])
        start_excl = np.maximum.accumulate(np.where(first, excl, 0))
        dst = block_base[blk_s] + (excl - start_excl)

        flat = np.ascontiguousarray(subrows_h, dtype=np.uint8).reshape(-1)
        # (the stream is already byte-dense; `flat` keeps the name the
        # ragged copy helpers expect)
        try:
            from . import rle_host

            native = rle_host.available()
        except Exception:
            native = False
        if native:
            from . import rle_host

            rle_host.ragged_copy(flat, src_s, stream, dst, sb_s)
        else:
            tot = int(sb_s.sum())
            sidx2 = np.repeat(src_s - (np.cumsum(sb_s) - sb_s), sb_s) \
                + np.arange(tot)
            didx2 = np.repeat(dst - (np.cumsum(sb_s) - sb_s), sb_s) \
                + np.arange(tot)
            stream[didx2] = flat[sidx2]

    if raw.any():
        rb = np.ascontiguousarray(raw_bytes_h, dtype=np.uint8)
        for i, b in enumerate(np.nonzero(raw)[0]):
            stream[block_base[b] : block_base[b] + 4 * cells] = rb[i]
    return stream, total


def _subrow_squeeze(packed, abytes, acap, lcap, chunk, aidx):
    """Live-subrow selection + row-gather (d2h ∝ compressed bytes)."""
    spq = 5 * chunk // SUBROW
    nsub = (abytes + (SUBROW - 1)) // SUBROW  # ceil(s/64) per active chunk
    sub_live = (
        jnp.arange(spq, dtype=I32)[None, :] < nsub[:, None]
    ).reshape(acap * spq)
    sidx = jnp.arange(acap * spq, dtype=I32)
    (lidx,), lcount = pack.compact_live(
        (sidx,), sub_live, pack.ceil_log2(acap * spq)
    )
    lidx = _fit(
        jnp.where(jnp.arange(acap * spq, dtype=I32) < lcount, lidx, 0), lcap
    )
    subrows = jnp.take(packed.reshape(acap * spq, SUBROW), lidx, axis=0)
    # compacted per-active-chunk metadata rides along so the host never
    # needs the full (nchunks,) table (readbacks scale with compressed size)
    return subrows, aidx, abytes


@functools.partial(
    jax.jit, static_argnames=("acap", "lcap", "use_pallas_kernel")
)
def pack_compacted(fvc, dscc, meta, emitted, acap, lcap,
                   use_pallas_kernel=None):
    """PASS 2 on PRE-COMPACTED active rows (fused tokenize+compact path).

    fvc/dscc/meta from tokenize_compact_tiles; `emitted` the device scalar
    count of written rows (entries beyond it are uninitialized memory and
    are neutralized here).  Returns (subrows, aidx, abytes) like
    pack_active.
    """
    from . import pack_pallas

    def fit2d(a, rows):
        if rows <= a.shape[0]:
            return a[:rows]
        pad = jnp.zeros((rows - a.shape[0],) + a.shape[1:], a.dtype)
        return jnp.concatenate([a, pad], axis=0)

    fvr = fit2d(fvc, acap)
    dsr = fit2d(dscc, acap)
    metar = fit2d(meta, acap)
    chunk = fvr.shape[1]
    idxs = jnp.arange(acap, dtype=I32)
    aidx = jnp.where(idxs < emitted, metar[:, 0], 0)
    abytes = jnp.where(idxs < emitted, metar[:, 1], 0)

    if use_pallas_kernel is None:
        use_pallas_kernel = pack_pallas.available()
    if (
        use_pallas_kernel
        and chunk == pack_pallas.Q
        and acap % pack_pallas.GR == 0
    ):
        packed = pack_pallas.pack_staging(fvr, dsr).astype(U8)
    else:
        fv, iv = quant.quantize(fvr, jnp.float32(1.0))
        izero, is_byte, is_short, is_i3 = _classify(iv)
        mode = _group_modes(izero, is_byte, is_short, is_i3, (acap, chunk))
        p0, p1, p2, p3_, p4, cost = _planes(
            fvr, iv, fv, dsr, mode, izero, is_byte, is_short, is_i3
        )
        staging = jnp.stack(
            [p.astype(U8) for p in (p0, p1, p2, p3_, p4)], axis=-1
        ).reshape(acap, 5 * chunk)
        off = jnp.cumsum(cost, axis=1) - cost
        base = 5 * jnp.arange(chunk, dtype=I32)[None, :] - off
        kio = jnp.arange(5, dtype=I32)[None, None, :]
        livb = kio < cost[:, :, None]
        ddt = jnp.int16 if 5 * chunk <= 32767 else I32
        dist = jnp.where(
            livb, jnp.broadcast_to(base[:, :, None], (acap, chunk, 5)), -1
        ).astype(ddt).reshape(acap, 5 * chunk)
        packed, _ = pack.compact_rows(staging, dist, pack.ceil_log2(5 * chunk))

    return _subrow_squeeze(packed, abytes, acap, lcap, chunk, aidx)


def bucket(n, lo=8):
    """Round up to a quarter-step capacity (1, 1.25, 1.5, 1.75 x 2^k).

    Buckets bound jit recompiles across a volume stream; quarter steps
    keep the expected capacity overshoot ~11% (power-of-two buckets
    averaged ~33%, and every downstream pack/gather/staging pass scales
    with the cap) at the cost of at most 4x more cached programs.
    """
    n = max(int(n), lo)
    k = max(int(np.floor(np.log2(n))) - 2, 0)
    return ((n + (1 << k) - 1) >> k) << k


def plan_capacities(chunk_bytes_h):
    """Host-side: (acap, lcap) buckets from the pass-1 chunk byte counts."""
    active = chunk_bytes_h > 0
    acount = int(np.count_nonzero(active))
    lcount = int(((chunk_bytes_h[active] + SUBROW - 1) // SUBROW).sum())
    return bucket(acount), bucket(lcount)


def assemble_payload_filtered(subrows_h, aidx_h, abytes_h, acount, sizes_h,
                              raw_h, raw_bytes_h, cells, chunk):
    """Sparse assembly for the fused path: drops dead pad entries and the
    chunks of raw-fallback blocks (which were packed before the block
    totals revealed them as raw).  Subrow SOURCE offsets are accounted
    over ALL emitted entries — the squeeze packed every one of them."""
    sizes = np.asarray(sizes_h, dtype=np.int64)
    raw = np.asarray(raw_h, dtype=bool)
    aidx = np.asarray(aidx_h[:acount], dtype=np.int64)
    ab = np.asarray(abytes_h[:acount], dtype=np.int64)
    ncpb = cells // chunk

    nsub_all = (ab + SUBROW - 1) // SUBROW
    src_all = (np.cumsum(nsub_all) - nsub_all) * SUBROW

    # drop dead pad rows, tile-padding fake actives (chunk ids beyond the
    # real grid), and chunks of raw-fallback blocks
    nnn = sizes.size
    blk_all = np.minimum(aidx // ncpb, nnn - 1)
    keep = (ab > 0) & (aidx < nnn * ncpb) & ~raw[blk_all]
    aidx, ab, src = aidx[keep], ab[keep], src_all[keep]
    kcount = int(keep.sum())

    total = int(sizes.sum())
    stream = np.empty(total, dtype=np.uint8)
    block_base = np.cumsum(sizes) - sizes

    if kcount:
        blk = aidx // ncpb
        excl = np.cumsum(ab) - ab
        first = np.empty(kcount, dtype=bool)
        first[0] = True
        np.not_equal(blk[1:], blk[:-1], out=first[1:])
        start_excl = np.maximum.accumulate(np.where(first, excl, 0))
        dst = block_base[blk] + (excl - start_excl)

        flat = np.ascontiguousarray(subrows_h, dtype=np.uint8).reshape(-1)
        # (the stream is already byte-dense; `flat` keeps the name the
        # ragged copy helpers expect)
        tot_rle = int(ab.sum())
        sidx = np.repeat(src - excl, ab) + np.arange(tot_rle)
        didx = np.repeat(dst - excl, ab) + np.arange(tot_rle)
        stream[didx] = flat[sidx]

    if raw.any():
        rb = np.ascontiguousarray(raw_bytes_h, dtype=np.uint8)
        for i, b in enumerate(np.nonzero(raw)[0]):
            stream[block_base[b] : block_base[b] + 4 * cells] = rb[i]
    return stream, total


def assemble_payload_sparse(subrows_h, aidx_h, abytes_h, acount, sizes_h,
                            raw_h, raw_bytes_h, cells, chunk):
    """Host: ragged-concat from COMPACTED per-active-chunk metadata.

    subrows_h (lcap, SUBROW) u8, aidx_h/abytes_h (acap,) from pack_active
    (only the first `acount` entries are live), sizes/raw per block.
    Everything here is ∝ compressed size.  Returns (stream uint8, total).
    """
    sizes = np.asarray(sizes_h, dtype=np.int64)
    raw = np.asarray(raw_h, dtype=bool)
    aidx = np.asarray(aidx_h[:acount], dtype=np.int64)
    ab = np.asarray(abytes_h[:acount], dtype=np.int64)
    ncpb = cells // chunk

    total = int(sizes.sum())
    stream = np.empty(total, dtype=np.uint8)
    block_base = np.cumsum(sizes) - sizes

    if acount:
        blk = aidx // ncpb
        excl = np.cumsum(ab) - ab
        # within-block prefix: excl minus the excl at the block's first
        # active chunk (groupwise broadcast via maximum.accumulate)
        first = np.empty(acount, dtype=bool)
        first[0] = True
        np.not_equal(blk[1:], blk[:-1], out=first[1:])
        start_excl = np.maximum.accumulate(np.where(first, excl, 0))
        dst = block_base[blk] + (excl - start_excl)

        nsub = (ab + SUBROW - 1) // SUBROW
        src = (np.cumsum(nsub) - nsub) * SUBROW

        flat = np.ascontiguousarray(subrows_h, dtype=np.uint8).reshape(-1)
        # (the stream is already byte-dense; `flat` keeps the name the
        # ragged copy helpers expect)
        try:
            from . import rle_host

            native = rle_host.available()
        except Exception:
            native = False
        if native:
            # per-chunk memcpys in C++ (~10x the numpy fancy-index copy)
            from . import rle_host

            rle_host.ragged_copy(flat, src, stream, dst, ab)
        else:
            tot_rle = int(ab.sum())
            sidx = np.repeat(src - excl, ab) + np.arange(tot_rle)
            didx = np.repeat(dst - excl, ab) + np.arange(tot_rle)
            stream[didx] = flat[sidx]

    if raw.any():
        rb = np.ascontiguousarray(raw_bytes_h, dtype=np.uint8)
        for i, b in enumerate(np.nonzero(raw)[0]):
            stream[block_base[b] : block_base[b] + 4 * cells] = rb[i]
    return stream, total


def assemble_payload(subrows_h, chunk_bytes_h, sizes_h, raw_h, raw_bytes_h,
                     cells, chunk):
    """Host: ragged-concat per-chunk payloads into the reference stream.

    subrows_h (lcap, SUBROW) u8 from pack_active; chunk_bytes_h (nchunks,)
    in block order; raw_bytes_h (n_raw, 4*cells) u8 rows for raw blocks in
    block order.  Returns (stream uint8, total) — the payload area content.
    All numpy work is ∝ compressed size (fancy-index ragged copy).
    """
    sizes = np.asarray(sizes_h, dtype=np.int64)
    raw = np.asarray(raw_h, dtype=bool)
    cb = np.asarray(chunk_bytes_h, dtype=np.int64)
    ncpb = cells // chunk
    n = sizes.size

    total = int(sizes.sum())
    stream = np.empty(total, dtype=np.uint8)

    # destination offset of every chunk: block base + within-block prefix
    block_base = np.cumsum(sizes) - sizes
    within = cb.reshape(n, ncpb)
    within = np.cumsum(within, axis=1) - within
    dst = (block_base[:, None] + within).reshape(-1)

    # source offset of every active chunk in the flat subrow buffer
    nsub = (cb + SUBROW - 1) // SUBROW
    src = (np.cumsum(nsub) - nsub) * SUBROW

    if cb.sum():
        flat = np.ascontiguousarray(subrows_h, dtype=np.uint8).reshape(-1)
        # (the stream is already byte-dense; `flat` keeps the name the
        # ragged copy helpers expect)
        tot_rle = int(cb.sum())
        # gather indices: for chunk q, flat[src_q : src_q + s_q]
        sidx = np.repeat(src - (np.cumsum(cb) - cb), cb) + np.arange(tot_rle)
        didx = np.repeat(dst - (np.cumsum(cb) - cb), cb) + np.arange(tot_rle)
        stream[didx] = flat[sidx]

    if raw.any():
        rb = np.ascontiguousarray(raw_bytes_h, dtype=np.uint8)
        for i, b in enumerate(np.nonzero(raw)[0]):
            stream[block_base[b] : block_base[b] + 4 * cells] = rb[i]
    return stream, total
