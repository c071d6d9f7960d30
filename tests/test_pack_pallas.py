"""Pallas pack kernel vs XLA staging front-pack (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from cvxcompress_tpu.ops import pack, pack_pallas as pp
from cvxcompress_tpu.ops import quant, rle_device

F32 = np.float32


def xla_packed(fvg, dsc, acap, chunk):
    fv, iv = quant.quantize(fvg, jnp.float32(1.0))
    izero, ib, isx, i3 = rle_device._classify(iv)
    mode = rle_device._group_modes(izero, ib, isx, i3, (acap, chunk))
    p0, p1, p2, p3_, p4, cost = rle_device._planes(
        fvg, iv, fv, dsc, mode, izero, ib, isx, i3
    )
    staging = jnp.stack(
        [p.astype(jnp.uint8) for p in (p0, p1, p2, p3_, p4)], axis=-1
    ).reshape(acap, 5 * chunk)
    off = jnp.cumsum(cost, axis=1) - cost
    base = 5 * jnp.arange(chunk, dtype=jnp.int32)[None, :] - off
    kio = jnp.arange(5, dtype=jnp.int32)[None, None, :]
    livb = kio < cost[:, :, None]
    dist = jnp.where(
        livb, jnp.broadcast_to(base[:, :, None], (acap, chunk, 5)), -1
    ).astype(jnp.int16).reshape(acap, 5 * chunk)
    packed, _ = pack.compact_rows(staging, dist, pack.ceil_log2(5 * chunk))
    return np.asarray(packed), np.asarray(cost)


def test_pack_kernel_matches_xla(rng):
    chunk = 128
    acap = pp.GR  # one grid step in interpret mode
    # synthesize active-chunk data: scaled coeffs with varied magnitudes
    fv = (rng.standard_normal((acap, chunk)) * 1e3).astype(F32)
    fv[rng.random((acap, chunk)) < 0.6] = 0.0
    fv[0, :8] = [1, -1, 124, -124, 2, 3, 4, 5]  # allbyte group
    fv[1, :8] = [200, -200, 300, -300, 1000, -1000, 32767, -32768]
    fv[2, :8] = [1e5, -1e5, 8388607, -8388608, 7e4, -7e4, 99999, -99999]
    fv[3, 5] = np.nan
    fv[3, 9] = 3e12

    # descriptors from the tokenize pass (1 block of acap chunks)
    desc, cb, sizes, raw, counts = rle_device.tokenize_desc(
        rle_device.as_rows(fv.reshape(1, -1)), 1, chunk
    )
    want, cost = xla_packed(jnp.asarray(fv), desc, acap, chunk)
    got = np.asarray(
        pp.pack_staging(jnp.asarray(fv), desc, interpret=True)
    ).astype(np.uint8)
    # compare only the live (front-packed payload) region of each row
    sizes_row = cost.sum(1)
    for r in range(acap):
        s = int(sizes_row[r])
        np.testing.assert_array_equal(got[r, :s], want[r, :s], err_msg=f"row {r}")


def test_patch_extract_interpret(rng):
    """The stripe patch-extract kernel composes chunk rows from gathered
    (rpc, xt, 128) plane patches (interpret mode, exact)."""
    import jax.numpy as jnp

    from cvxcompress_tpu.ops import pack_pallas

    bx, rpc, xt = 32, 4, 3
    acap = 16
    gf = (rng.standard_normal((acap, rpc, xt, 128)) * 100).astype(np.float32)
    gd = rng.integers(0, 1 << 28, size=(acap, rpc, xt, 128), dtype=np.int32)
    nbx2 = xt * rpc
    bxi = rng.integers(0, nbx2, size=acap, dtype=np.int32)
    of, od = pack_pallas.patch_extract(
        jnp.asarray(gf), jnp.asarray(gd), jnp.asarray(bxi[:, None]),
        bx, rpc, xt, interpret=True,
    )
    of, od = np.asarray(of), np.asarray(od)
    for i in range(acap):
        t, w = int(bxi[i]) // rpc, int(bxi[i]) % rpc
        for k in range(rpc):
            np.testing.assert_array_equal(
                of[i, k * bx : (k + 1) * bx],
                gf[i, k, t, w * bx : (w + 1) * bx],
            )
            np.testing.assert_array_equal(
                od[i, k * bx : (k + 1) * bx],
                gd[i, k, t, w * bx : (w + 1) * bx],
            )


def test_tile_compact_interpret(rng):
    """tile_compact (per-tile VMEM log-shift) front-packs each tile's
    live bytes exactly: random live-prefix subrows, tile-local
    distances, byte-exact vs a NumPy reference."""
    import jax.numpy as jnp

    from cvxcompress_tpu.ops import pack_pallas as pp

    SUBROW = 64
    trc = 16  # tile = (16, 128) = 2048 bytes = 32 subrows
    lcap = 128  # 8192-byte domain = 64 lane rows = 4 tiles
    spt = trc * 128 // SUBROW
    blive = rng.integers(0, SUBROW + 1, lcap).astype(np.int32)
    blive[-7:] = 0  # dead tail (cap padding)
    subrows = rng.integers(0, 256, (lcap, SUBROW)).astype(np.uint8)
    dom = lcap * SUBROW

    off = np.cumsum(blive) - blive
    off2 = off.reshape(-1, spt)
    ldist = (
        np.arange(spt)[None, :] * SUBROW - (off2 - off2[:, :1])
    ).reshape(lcap)
    cpk = np.where(
        np.arange(SUBROW)[None, :] < blive[:, None],
        (ldist[:, None].astype(np.int64) << 8) | subrows.astype(np.int64),
        -1,
    ).astype(np.int32)
    got = np.asarray(
        pp.tile_compact(
            jnp.asarray(cpk.reshape(dom // 128, 128)), trc, interpret=True
        )
    ).reshape(-1, trc * 128)

    want_mask = np.arange(SUBROW)[None, :] < blive[:, None]
    for t in range(got.shape[0]):
        rows = slice(t * spt, (t + 1) * spt)
        tile_want = subrows[rows][want_mask[rows]]
        n = tile_want.size
        np.testing.assert_array_equal(got[t, :n] & 255, tile_want)
        assert (got[t, :n] >> 8 == 0).all()  # packed prefix: dist 0
        assert (got[t, n:] == -1).all()  # tail dead
