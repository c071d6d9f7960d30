#!/usr/bin/env python
"""Round-5 bisect of pack_active_stripe_seg stages at the CI config.

Times cumulative prefixes of the seg pack (encode always included, since
the pack consumes its outputs): live-third compact, row gathers, staging
kernel, subrow compact, argsort+gather, byte compact.  Two-length
differencing; one JSON line out.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/cvx_jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from cvxcompress_tpu.ops import codec as jcodec  # noqa: E402
from cvxcompress_tpu.ops import pack as pk  # noqa: E402
from cvxcompress_tpu.ops import pack_pallas  # noqa: E402
from cvxcompress_tpu.ops import rle_device as rd  # noqa: E402
from cvxcompress_tpu.ops import wavelet as _wav  # noqa: E402
from cvxcompress_tpu.utils import volumes  # noqa: E402

I32 = jnp.int32
U8 = jnp.uint8
SUBROW = rd.SUBROW


def fetch1(x):
    return np.asarray(jnp.ravel(x)[:1])


def per_iter(run, iters=4, reps=3):
    def loop(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            last = None
            for j in range(n):
                last = run(j)
            fetch1(last)
            best = min(best, time.perf_counter() - t0)
        return best

    for _ in range(3):
        t1, t2 = loop(iters), loop(2 * iters)
        if t2 > t1:
            return (t2 - t1) / iters
        iters *= 2
    return max(t2, 1e-9) / (2 * iters)


@functools.partial(
    jax.jit,
    static_argnames=("tcap", "lcap", "bcap", "plane_geom", "stage"),
)
def pack_prefix(fv3, d3, cbrow, raw, tcap, lcap, bcap, plane_geom, stage):
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

    cbm = rd._masked_seg_bytes(cbrow, raw, vol_shape3, blk)
    cb_t3 = cbm.reshape(R * T, rpc)

    tlive = jnp.any(cb_t3 > 0, axis=1)
    (tpk,), tcount = pk.compact_live(
        (jnp.arange(R * T, dtype=I32),), tlive, pk.ceil_log2(R * T)
    )
    tidx = rd._fit(jnp.where(jnp.arange(R * T, dtype=I32) < tcount, tpk, 0),
                   tcap)
    if stage == "tcompact":
        return tidx
    trow = jnp.arange(tcap, dtype=I32)
    gf = jnp.take(fv3, tidx, axis=0)
    gd = jnp.take(d3, tidx, axis=0)
    gcb = jnp.where(
        (trow < tcount)[:, None], jnp.take(cb_t3, tidx, axis=0), 0
    )
    if stage == "gathers":
        return gf[0, 0] + gd[0, 0] + gcb[0, 0].astype(jnp.float32)

    packed = pack_pallas.pack_staging_seg(gf, gd, bx).astype(U8)
    if stage == "staging":
        return packed

    sb_flat = gcb.reshape(tcap * rpc)
    sid_flat = (tidx[:, None] * rpc
                + jnp.arange(rpc, dtype=I32)[None, :]).reshape(tcap * rpc)
    nsub = (sb_flat + (SUBROW - 1)) // SUBROW
    nsr = tcap * rpc * spseg
    sub_live = (
        jnp.arange(spseg, dtype=I32)[None, :] < nsub[:, None]
    ).reshape(nsr)
    spi = jnp.arange(spseg, dtype=I32)[None, :]
    sub_bytes = jnp.clip(
        sb_flat[:, None] - spi * SUBROW, 0, SUBROW
    ).reshape(nsr)
    nyp = nby * by
    r_of = sid_flat // nbx2
    g_of = sid_flat % nbx2
    zsl, yy = r_of // nyp, r_of % nyp
    zb_of, dz_of = zsl // bz, zsl % bz
    yb_of, dy_of = yy // by, yy % by
    borank = (((zb_of * nby + yb_of) * nbx2 + g_of) * bz + dz_of) \
        * by + dy_of
    meta_row = borank * spseg
    key2d = meta_row[:, None] + spi
    rows = [
        jnp.arange(nsr, dtype=I32),
        jnp.broadcast_to(key2d, (tcap * rpc, spseg)).reshape(nsr),
        sub_bytes,
    ]
    stacked = jnp.stack(rows)
    nrows = stacked.shape[0]
    packed2, count2 = pk.compact_live(
        (stacked,), jnp.broadcast_to(sub_live, (nrows, nsr)),
        pk.ceil_log2(nsr),
    )
    lcount = count2[0]
    live = jnp.arange(nsr, dtype=I32) < lcount
    lidx = rd._fit(jnp.where(live, packed2[0][0], 0), lcap)
    blive = rd._fit(jnp.where(live, packed2[0][nrows - 1], 0), lcap)
    if stage == "subcompact":
        return lidx + blive
    imax = jnp.iinfo(I32).max
    key = rd._fit(jnp.where(live, packed2[0][1], imax), lcap, fill=imax)
    perm = jnp.argsort(key)
    lidx = jnp.take(lidx, perm)
    blive = jnp.take(blive, perm)
    subrows = jnp.take(packed.reshape(nsr, SUBROW), lidx, axis=0)
    if stage == "sortgather":
        return subrows

    bmask = (
        jnp.arange(SUBROW, dtype=I32)[None, :] < blive[:, None]
    ).reshape(lcap * SUBROW)
    (bs,), bcount = pk.compact_live(
        (subrows.reshape(lcap * SUBROW),), bmask,
        pk.ceil_log2(lcap * SUBROW),
    )
    stream = rd._fit(
        jnp.where(jnp.arange(lcap * SUBROW, dtype=I32) < bcount, bs, 0),
        bcap,
    ).astype(U8)
    return stream


def main():
    shape, block, scale = (352, 416, 320), (32, 32, 32), 1e-2
    chunk = rd.chunk_cells(32768)
    vol = volumes.sinusoid_volume(*shape, periods=10)
    vd = [jax.device_put(vol), jax.device_put(vol * 1.0000001)]
    fetch1(vd[1])
    mf0 = jnp.float32(123.4)
    ncells = vol.size
    out = {}

    r = jcodec._encode_device(vd[0], mf0, jnp.float32(scale), False,
                              block, chunk)
    counts_h = np.asarray(r[5])
    caps = jcodec._derive_caps(counts_h, True)
    pg = r[7]["plane_geom"]

    def enc(v):
        ck, dsc, cb, sizes, raw, counts, mf, g = jcodec._encode_device(
            v, mf0, jnp.float32(scale), False, block, chunk
        )
        return ck.reshape(-1, 128), dsc.reshape(-1, 128), g["cbrow"], \
            g["raw_dev"]

    base = per_iter(lambda j: enc(vd[j % 2])[0])
    out["encode"] = round(base * 1e3, 3)
    print(f"encode: {base*1e3:.2f} ms", file=sys.stderr)

    for stage in ("tcompact", "gathers", "staging", "subcompact",
                  "sortgather", "full"):
        def run(j, stage=stage):
            f3, d3, cbrow, raw = enc(vd[j % 2])
            return pack_prefix(f3, d3, cbrow, raw, caps[0], caps[1],
                               caps[2], pg, stage)

        fetch1(run(0))
        t = per_iter(run)
        out[stage] = round(t * 1e3, 3)
        print(f"+{stage}: {t*1e3:.2f} ms (delta {((t-base))*1e3:+.2f})",
              file=sys.stderr)
    out["mcells_s_full"] = round(ncells / (out["full"] / 1e3) / 1e6)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
