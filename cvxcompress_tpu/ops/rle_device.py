"""TPU-native entropy encoder: quantize + RLE/escape grammar, fully vectorized.

The reference encoder (Run_Length_Encode_Slow.cpp:189-294) is a sequential
byte emitter with a mutable run-length register and a byte cursor.  On TPU
there are no byte-granular sequential stores, so the encoder is reformulated
as data-parallel passes over all cells of all blocks at once:

 1. quantize + classify every cell (zero / byte / short / int24 / float),
 2. decide the group-of-8 fast-path modes (all-byte / 8x-short / 8x-int24)
    with the reference's exact selection guards (:216,:231,:246),
 3. express EVERY emission as a per-cell token of <= 5 bytes:
    - packed groups decompose per lane (e.g. VLESC2_8x = lane0 [code,i16]
      + lanes1..7 [i16] = 3 + 7*2 = 17 B, byte-identical to the reference),
    - zero runs attach their run token (RLESC1/RLESC3/plain 0) to the run's
      LAST zero cell, which is exactly where the reference's deferred
      EncodeRLE_Slow flush lands in the stream,
    - raw-fallback blocks (stream > 4*cells, CvxCompress.cpp:350-360)
      become cost-4 tokens carrying the float coefficient bytes,
 4. per-block exclusive prefix sums of token costs -> within-block offsets,
    per-block sizes, and block base offsets (replacing the reference's
    omp-critical byte cursor, CvxCompress.cpp:370-374, with a deterministic
    scan),
 5. a gather-based compaction kernel: every output byte binary-searches its
    (block, cell) and picks its byte from the token table.

The emitted stream is bit-identical to the NumPy oracle encoder (and hence
to the reference grammar) — tested byte-for-byte in tests/test_rle_device.py.

Zero runs >= 2^24 are split (the oracle's documented fix of the reference's
24-bit truncation bug); the only reachable case is the all-zero 256^3 block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import quant

I32 = jnp.int32
U8 = jnp.uint8

MAX_RUN24 = (1 << 24) - 1

_B_RLESC1 = 127
_B_RLESC3 = 125
_B_VLESC2 = 0x83
_B_VLESC3 = 0x81
_B_VLESC4 = 0x80
_B_VLESC2_8X = 0x82
_B_VLESC3_8X = 0x7E


def _byte(v, k):
    """k-th little-endian byte of an int32 array, as int32 in [0,255]."""
    return jax.lax.shift_right_logical(v, jnp.int32(8 * k)) & 0xFF


def _sel(*pairs_and_default):
    """where-cascade: _sel(c1, v1, c2, v2, ..., default)."""
    out = pairs_and_default[-1]
    for i in range(len(pairs_and_default) - 3, -1, -2):
        out = jnp.where(pairs_and_default[i], pairs_and_default[i + 1], out)
    return out


def tokenize(coeffs, mulfac):
    """Per-cell token table for a (N, cells) coefficient batch.

    Returns (tok (N, cells, 5) uint8, cost (N, cells) int32,
             sizes (N,) int32, raw (N,) bool, off (N, cells) int32 exclusive).
    `mulfac` is (N,) float32.  cells must be a multiple of 8.
    """
    n_blocks, cells = coeffs.shape
    assert cells % 8 == 0
    fv, iv = quant.quantize(coeffs, mulfac[:, None])

    izero = iv == 0
    is_byte = (iv > -125) & (iv < 125)  # zero lanes count, as in ref :215
    is_short = (iv >= -32768) & (iv <= 32767)
    is_i3 = (iv >= -8388608) & (iv <= 8388607)

    g = lambda a: a.reshape(n_blocks, cells // 8, 8)  # noqa: E731
    nzero = g(izero).sum(-1)
    nb = g(is_byte).sum(-1)
    ns = g(is_short).sum(-1)
    nozero = nzero == 0
    allbyte = nozero & (nb == 8)
    allshort = (
        nozero & ~allbyte & g(is_short).all(-1) & (nb + (8 - nb) * 3 > 17)
    )
    alli3 = (
        nozero & ~allbyte & ~allshort & g(is_i3).all(-1)
        & (nb + (ns - nb) * 3 + (8 - ns) * 4 > 25)
    )

    rep = lambda a: jnp.repeat(a, 8, axis=1)  # noqa: E731  group -> lanes
    pb, ps, p3 = rep(allbyte), rep(allshort), rep(alli3)
    lane0 = jnp.asarray(
        (np.arange(cells) % 8) == 0, dtype=bool
    )[None, :]

    # zero-run structure: run token attaches to the run's last zero cell
    idx = jnp.arange(cells, dtype=I32)[None, :]
    member = izero  # packed groups have no zero lanes by construction
    last_nm = jax.lax.cummax(jnp.where(member, I32(-1), idx), axis=1)
    nxt_member = jnp.concatenate(
        [member[:, 1:], jnp.zeros((n_blocks, 1), dtype=bool)], axis=1
    )
    run_end = member & ~nxt_member
    run_len = idx - last_nm  # valid at run_end positions

    # mixed-path lane classes (andnot chain, :259-261)
    cb = is_byte & ~izero
    cs = is_short & ~is_byte
    c3 = is_i3 & ~is_short
    # float class = ~is_i3 (ranges nest)

    runcost = _sel(
        run_len == 1, 1,
        run_len < 256, 2,
        run_len <= MAX_RUN24, 4,
        5,  # split case: [RLESC3 FFFFFF][0]
    )
    cost = _sel(
        pb, 1,
        ps, jnp.where(lane0, 3, 2),
        p3, jnp.where(lane0, 4, 3),
        member, jnp.where(run_end, runcost, 0),
        cb, 1,
        cs, 3,
        c3, 4,
        5,
    ).astype(I32)

    fvb = jax.lax.bitcast_convert_type(fv, I32)  # scaled-float payload bits
    rl = jnp.minimum(run_len, MAX_RUN24)  # split case emits FFFFFF + [0]
    big = run_len >= 256

    plane0 = _sel(
        pb, _byte(iv, 0),
        ps, jnp.where(lane0, _B_VLESC2_8X, _byte(iv, 0)),
        p3, jnp.where(lane0, _B_VLESC3_8X, _byte(iv, 0)),
        member, _sel(run_len == 1, 0, big, _B_RLESC3, _B_RLESC1),
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

    sizes0 = cost.sum(axis=1, dtype=I32)
    raw = sizes0 > 4 * cells

    # raw fallback: every cell is a 4-byte token of the float COEFFICIENT
    # (the reference memcpy's the post-transform block, CvxCompress.cpp:359)
    cfb = jax.lax.bitcast_convert_type(coeffs.astype(jnp.float32), I32)
    rawcol = raw[:, None]
    cost = jnp.where(rawcol, I32(4), cost)
    plane0 = jnp.where(rawcol, _byte(cfb, 0), plane0)
    plane1 = jnp.where(rawcol, _byte(cfb, 1), plane1)
    plane2 = jnp.where(rawcol, _byte(cfb, 2), plane2)
    plane3 = jnp.where(rawcol, _byte(cfb, 3), plane3)

    tok = jnp.stack(
        [plane0, plane1, plane2, plane3, plane4], axis=-1
    ).astype(U8)
    sizes = jnp.where(raw, I32(4 * cells), sizes0)
    off = jnp.cumsum(cost, axis=1, dtype=I32) - cost
    return tok, cost, sizes, raw, off


def _ceil_log2(n):
    return max(1, int(np.ceil(np.log2(max(n, 2)))))


@functools.partial(jax.jit, static_argnames=("cap",))
def compact(tok, off, sizes, cap):
    """Gather-compaction: emit the first `cap` bytes of the global stream.

    Every output byte position finds its (block, cell, k) by binary search
    over the block base offsets and the within-block cell offsets, then
    gathers its byte from the token table.  Out-of-range positions yield 0.
    """
    n_blocks, cells, _ = tok.shape
    bases = jnp.cumsum(sizes, dtype=I32) - sizes  # exclusive
    total = bases[-1] + sizes[-1]

    gidx = jnp.arange(cap, dtype=I32)
    # block = rightmost n with bases[n] <= g
    blk = jnp.searchsorted(bases, gidx, side="right").astype(I32) - 1
    blk = jnp.clip(blk, 0, n_blocks - 1)
    j = gidx - jnp.take(bases, blk)

    # cell = rightmost c with off[blk, c] <= j   (off[., 0] == 0 always)
    off_flat = off.reshape(-1)
    cell = jnp.zeros_like(gidx)
    for b in range(_ceil_log2(cells) - 1, -1, -1):
        cand = cell + (1 << b)
        ok = cand < cells
        v = jnp.take(off_flat, blk * cells + jnp.minimum(cand, cells - 1))
        step = ok & (v <= j)
        cell = jnp.where(step, cand, cell)

    k = j - jnp.take(off_flat, blk * cells + cell)
    k = jnp.clip(k, 0, 4)
    byte = jnp.take(tok.reshape(-1), (blk * cells + cell) * 5 + k)
    return jnp.where(gidx < total, byte, U8(0))


@jax.jit
def encode_blocks(coeffs, mulfac):
    """Full device encode of a (N, cells) batch.

    Returns (tok, off, sizes (N,) int32, raw (N,) bool) — feed `tok/off/sizes`
    to `compact` with a host-chosen capacity to materialize the byte stream.
    """
    tok, _cost, sizes, raw, off = tokenize(coeffs, mulfac)
    return tok, off, sizes, raw


def bucket_cap(total, align=1024):
    """Round a byte count up to a bucket to bound jit recompiles of compact."""
    total = int(total)
    if total <= align:
        return align
    return 1 << int(np.ceil(np.log2(total)))
