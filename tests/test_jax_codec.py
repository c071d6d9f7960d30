"""End-to-end TPU-backend codec: round trips, cross-backend compatibility."""

import numpy as np
import pytest

import cvxcompress_tpu as cvx
from cvxcompress_tpu import container as ctn
from cvxcompress_tpu.oracle import codec as ocodec
from cvxcompress_tpu.oracle import rle as orle
from cvxcompress_tpu.ops import codec as jcodec

from conftest import make_radial_volume, make_sinusoid_volume, rel_error_and_snr

F32 = np.float32


def test_roundtrip_sinusoid_quality_bars():
    vol = make_sinusoid_volume(96, 64, 64, periods=3)
    data, ratio = jcodec.compress(vol, 1e-2, block=(32, 32, 32))
    out = jcodec.decompress(data)
    err, snr = rel_error_and_snr(vol, out)
    assert err < 2e-4, err
    assert snr > 75.0, snr
    assert ratio > 500.0


def test_roundtrip_radial_partial_blocks():
    vol = make_radial_volume(nz=19, ny=27, nx=41)
    data, ratio = jcodec.compress(vol, 1e-2, block=(16, 16, 16))
    out = jcodec.decompress(data)
    err, _ = rel_error_and_snr(vol, out)
    assert err < 1e-2
    # quantizer correctness: error shrinks with scale
    data2, _ = jcodec.compress(vol, 1e-4, block=(16, 16, 16))
    err2, _ = rel_error_and_snr(vol, jcodec.decompress(data2))
    assert err2 < err / 10


@pytest.mark.parametrize(
    "shape,block",
    [
        ((96, 64, 64), (32, 32, 32)),
        ((19, 27, 41), (16, 16, 16)),
        ((64, 64, 128), (128, 64, 32)),
        ((1, 32, 32), (16, 16, 1)),
        ((40, 24, 24), (8, 8, 8)),
    ],
)
def test_volume_order_decompress_matches_blockmajor(shape, block, rng):
    """The relayout-free decompress path agrees with the legacy block-major
    expand+inverse+unlayout to the cross-shape matmul tolerance."""
    import jax.numpy as jnp

    from cvxcompress_tpu.ops import rle_device

    vol = rng.standard_normal(shape).astype(np.float32)
    data, _ = jcodec.compress(vol, 1e-3, block=block)
    hdr, blkoffs, blkmf, pbase = ctn.unpack(data)
    cells = block[0] * block[1] * block[2]
    chunk = rle_device.chunk_cells(cells)
    coeffs = jcodec._decode_payloads_host(data, hdr, blkoffs, blkmf, pbase)
    pay, inv, _ = jcodec.sparse_chunks(coeffs, cells, chunk)
    a = np.asarray(jcodec._decompress_sparse(
        jnp.asarray(pay), jnp.asarray(inv), shape, block, chunk))
    b = np.asarray(jcodec._decompress_sparse_blockmajor(
        jnp.asarray(pay), jnp.asarray(inv), shape, block, chunk))
    denom = np.sqrt(np.mean(b.astype(np.float64) ** 2)) + 1e-30
    rel = np.sqrt(np.mean((a - b).astype(np.float64) ** 2)) / denom
    assert rel < 1e-6, rel


def test_cross_backend_decode():
    # jax-compressed containers decode with the oracle backend and vice versa
    vol = make_radial_volume(nz=16, ny=24, nx=32)
    dj, _ = jcodec.compress(vol, 1e-2, block=(8, 8, 8))
    do, _ = ocodec.compress(vol, 1e-2, block=(8, 8, 8))
    outs = [
        ocodec.decompress(dj),
        jcodec.decompress(dj),
        ocodec.decompress(do),
        jcodec.decompress(do),
    ]
    for o in outs:
        err, _ = rel_error_and_snr(vol, o)
        assert err < 1e-2
    # decoding the SAME container must agree bitwise across backends
    # (identical entropy decode; identical-to-1e-5 inverse transforms would
    # differ bitwise, so compare payload-level decode instead below)
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-5 * np.abs(vol).max())


def test_container_bit_equality_same_coefficients():
    # downstream of the transform, the two backends are bit-identical:
    # feed the SAME coefficients through both entropy stages
    import jax.numpy as jnp

    from cvxcompress_tpu.ops import rle_device, wavelet

    r = np.random.default_rng(5)
    blocks = r.standard_normal((6, 8, 8, 8)).astype(F32)
    coeffs = np.asarray(wavelet.forward_3d(jnp.asarray(blocks)))
    mf = F32(0.37)
    flat = coeffs.reshape(6, -1)
    cells = flat.shape[1]
    chunk = rle_device.chunk_cells(cells)
    fv = jnp.asarray((flat * mf).astype(F32))
    desc, chunk_bytes, sizes, raw, counts = rle_device.tokenize_desc(
        rle_device.as_rows(fv), 6, chunk
    )
    cchunks = fv.reshape(-1, chunk)
    cb_h, sizes_h, raw_h = map(np.asarray, (chunk_bytes, sizes, raw))
    acap, lcap = rle_device.plan_capacities(cb_h)
    subrows = np.asarray(
        rle_device.pack_active(cchunks, desc, chunk_bytes, acap, lcap)[0]
    )
    stream, total = rle_device.assemble_payload(
        subrows, cb_h, sizes_h, raw_h, None, cells, chunk
    )
    pos = 0
    for i in range(6):
        expect = orle.encode(mf, flat[i])
        got = stream[pos : pos + sizes_h[i]].tobytes()
        assert got == expect, f"block {i} differs"
        pos += sizes_h[i]


def test_local_rms_roundtrip():
    vol = make_radial_volume(nz=16, ny=16, nx=16)
    data, _ = jcodec.compress(vol, 1e-2, block=(8, 8, 8), use_local_rms=True)
    hdr, _, blkmf, _ = ctn.unpack(data)
    assert hdr.use_local_rms and blkmf is not None and np.all(blkmf > 0)
    out = jcodec.decompress(data)
    err, _ = rel_error_and_snr(vol, out)
    assert err < 1e-2


def test_2d_volume():
    vol = make_radial_volume(nz=1, ny=32, nx=32)
    data, _ = jcodec.compress(vol, 1e-2, block=(16, 16, 1))
    out = jcodec.decompress(data)
    err, _ = rel_error_and_snr(vol, out)
    assert err < 1e-2


def test_public_api_jax_backend():
    vol = make_sinusoid_volume(64, 32, 32, periods=2)
    data, ratio = cvx.compress(vol, 1e-2, block=(32, 32, 32), backend="jax")
    out = cvx.decompress(data, backend="jax")
    err, snr = rel_error_and_snr(vol, out)
    assert err < 2e-4 and snr > 75.0


def test_compressed_size_close_to_oracle():
    # transforms differ at ~1e-6 so sizes can differ slightly at quantization
    # boundaries; they must stay within a fraction of a percent
    vol = make_radial_volume(nz=16, ny=24, nx=32)
    dj, _ = jcodec.compress(vol, 1e-2, block=(8, 8, 8))
    do, _ = ocodec.compress(vol, 1e-2, block=(8, 8, 8))
    assert abs(int(dj.size) - int(do.size)) <= max(64, 0.01 * do.size)


@pytest.mark.parametrize(
    "vol_shape,block",
    [
        ((8, 8, 256), (256, 8, 8)),   # max block extent on the fast axis
        ((256, 8, 8), (8, 8, 256)),   # max extent on the slow axis
        ((64, 64, 64), (64, 64, 64)), # single big cubic block
        ((4, 128, 128), (128, 128, 1)),  # 2D blocks over a thin volume
    ],
)
def test_extreme_block_shapes(vol_shape, block):
    vol = make_radial_volume(*vol_shape)
    data, _ = jcodec.compress(vol, 1e-3, block=block)
    out = jcodec.decompress(data)
    err, _ = rel_error_and_snr(vol, out)
    assert err < 2e-3, (vol_shape, block, err)
    # cross-backend: oracle decodes the same container
    out2 = ocodec.decompress(data)
    err2, _ = rel_error_and_snr(vol, out2)
    assert err2 < 2e-3


def test_volume_rowmap_is_block_layout(rng):
    """volume_rowmap is exactly the to_blocks chunk permutation (bx>=128)."""
    from cvxcompress_tpu.ops import blocks as blkops

    shape, block = (24, 40, 256), (128, 8, 8)
    vol = rng.standard_normal(shape).astype(np.float32)
    nbz, nby, nbx = blkops.grid_shape(shape, block)
    pad = np.zeros((nbz * 8, nby * 8, nbx * 128), np.float32)
    pad[:24, :40, :256] = vol
    flat = pad.reshape(-1, 128)
    bm = blkops.to_blocks_np(vol, block).reshape(-1, 128)
    rowmap = jcodec.volume_rowmap(shape, block)
    c = np.arange(bm.shape[0], dtype=np.int64)
    np.testing.assert_array_equal(flat[rowmap(c)], bm)


def test_volume_tokenize_matches_blockmajor_interpret(rng):
    """The direct-volume tokenize tiling produces bit-identical descriptors
    to the block-major kernel on the SAME values (interpret mode)."""
    from cvxcompress_tpu.ops import tokenize_pallas as tp

    shape, block = (128, 128, 256), (128, 128, 128)
    assert tp.volume_path_ok(shape, block)
    nchunks = (shape[0] * shape[1] * shape[2]) // 128
    fvv_flat = (rng.standard_normal((nchunks, 128)) * 50).astype(np.float32)
    fvv_flat[rng.random((nchunks, 128)) < 0.85] = 0.0

    rowmap = jcodec.volume_rowmap(shape, block)
    c = np.arange(nchunks, dtype=np.int64)
    fvp = np.zeros((tp.pad_rows(nchunks), 128), np.float32)
    fvp[:nchunks] = fvv_flat[rowmap(c)]  # same VALUES, block-major order

    import jax.numpy as jnp

    d_v = tp.tokenize_desc_volume_fast(
        jnp.asarray(fvv_flat), shape, block, interpret=True
    )
    d_b = tp.tokenize_desc_fast(
        jnp.asarray(fvp), 2, nchunks // 2, 128, interpret=True
    )
    for a, b, name in zip(d_v, d_b, ("desc", "cb", "sizes", "raw", "counts")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)


def test_volume_compress_path_container_parity(monkeypatch, rng):
    """compress() through the bx>=128 volume fast path emits the same
    container as the standard path (interpret-mode kernels on CPU)."""
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)

    shape, block = (128, 128, 256), (128, 128, 128)
    vol = make_sinusoid_volume(*shape, periods=3)
    ref, _ = jcodec.compress(vol, 1e-2, block=block)  # standard CPU path

    monkeypatch.setattr(jcodec, "use_pallas", lambda: True)
    monkeypatch.setenv("CVX_FUSED_W", "0")  # pin the VOLUME path under test
    monkeypatch.setenv("CVX_VOLUME_COMPRESS", "1")
    assert jcodec._use_volume_path(shape, block, False, 128)
    got, _ = jcodec.compress(vol, 1e-2, block=block)
    # payload layout + sizes identical; values may differ at quantization
    # boundaries (einsum-shape 1ulp) — require byte equality here since the
    # sinusoid sits far from truncation edges
    np.testing.assert_array_equal(ref, got)


def test_stripe_tokenize_matches_blockmajor_interpret(rng):
    """The bx<128 stripe tiling produces the same descriptors (gathered to
    chunk order) and byte accounting as the block-major kernel on the SAME
    values (interpret mode)."""
    import jax.numpy as jnp

    from cvxcompress_tpu.ops import tokenize_pallas as tp

    shape, block = (64, 96, 96), (32, 32, 32)
    assert tp.stripe_path_ok(shape, block)
    nbz, nby, nbx = 2, 3, 3
    nbx2 = 4  # padded_nbx(3, 32) with 128-lane alignment
    R, W = 64 * 96, nbx2 * 32
    fvv = np.zeros((R, W), np.float32)
    real = (rng.standard_normal((R, nbx * 32)) * 50).astype(np.float32)
    real[rng.random(real.shape) < 0.85] = 0.0
    fvv[:, : nbx * 32] = real

    d_v, _cbrow, cb_v, sz_v, raw_v, cnt_v = tp.tokenize_desc_stripe_fast(
        jnp.asarray(fvv), shape, block, interpret=True
    )

    # same values in block-major chunk order via the stripe rowmap
    rowmap = jcodec.stripe_rowmap(shape, block)
    nchunks = nbz * nby * nbx * (32 * 32 * 32 // 128)
    rows = np.asarray(rowmap(np.arange(nchunks, dtype=np.int64)))
    fvp = np.zeros((tp.pad_rows2(nchunks), 128), np.float32)
    fvp[:nchunks] = fvv.reshape(-1, 32)[rows.reshape(-1)].reshape(nchunks, 128)
    d_b, cb_b, sz_b, raw_b, cnt_b = tp.tokenize_desc_fast2(
        jnp.asarray(fvp), nbz * nby * nbx, 32 * 32 * 32 // 128, 128,
        interpret=True,
    )
    got_desc = np.asarray(d_v).reshape(-1, 32)[rows.reshape(-1)].reshape(
        nchunks, 128
    )
    np.testing.assert_array_equal(got_desc, np.asarray(d_b))
    np.testing.assert_array_equal(np.asarray(cb_v), np.asarray(cb_b))
    np.testing.assert_array_equal(np.asarray(sz_v), np.asarray(sz_b))
    np.testing.assert_array_equal(np.asarray(raw_v), np.asarray(raw_b))
    np.testing.assert_array_equal(np.asarray(cnt_v)[:2], np.asarray(cnt_b))


def test_stripe_compress_path_container_parity(monkeypatch):
    """compress() through the bx<128 stripe fast path emits the same
    container as the standard path (interpret-mode kernels on CPU)."""
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)

    shape, block = (64, 96, 96), (32, 32, 32)
    vol = make_sinusoid_volume(*shape, periods=3)
    ref, _ = jcodec.compress(vol, 1e-2, block=block)  # standard CPU path

    monkeypatch.setenv("CVX_STRIPE", "1")
    monkeypatch.setenv("CVX_STRIPE_FUSED", "0")  # pin the staged path
    monkeypatch.setattr(jcodec, "use_pallas", lambda: True)
    assert jcodec._use_stripe_path(shape, block, False, 128)
    got, _ = jcodec.compress(vol, 1e-2, block=block)
    np.testing.assert_array_equal(ref, got)


def test_fused_tokenize_compact_interpret(rng):
    """Fused tokenize+compact kernel vs dense kernel path (interpret mode).

    Exercises the tile-boundary run carry, within-tile row compaction,
    append-cursor DMAs, and the pad-tile fake-active filtering."""
    import jax.numpy as jnp

    from cvxcompress_tpu.ops import rle_device, tokenize_pallas as tp

    n, cells, chunk = 3, tp.TR * 128, 128  # 3 blocks => 3 tiles exactly
    ncpb = cells // chunk
    nchunks = n * ncpb
    c = (rng.standard_normal((n, cells)) * 60).astype(np.float32)
    c[rng.random((n, cells)) < 0.9] = 0.0
    padded = np.zeros((tp.pad_rows(nchunks), chunk), np.float32)
    padded[:nchunks] = c.reshape(nchunks, chunk)
    fvp = jnp.asarray(padded)

    d_desc, d_cb, d_sizes, d_raw, _ = tp.tokenize_desc_fast(
        fvp, n, ncpb, chunk, interpret=True
    )
    f_cb, f_sizes, f_raw, f_counts, fvc, dscc, meta = tp.tokenize_compact_fast(
        fvp, n, ncpb, chunk, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(d_cb), np.asarray(f_cb))
    np.testing.assert_array_equal(np.asarray(d_sizes), np.asarray(f_sizes))

    emitted = int(np.asarray(f_counts)[0])
    meta_h = np.asarray(meta)[:emitted, :2]
    live = meta_h[:, 1] > 0
    got_ids = meta_h[live, 0]
    want_ids = np.nonzero(np.asarray(d_cb) > 0)[0]
    np.testing.assert_array_equal(got_ids, want_ids)
    fvc_h, dscc_h = np.asarray(fvc), np.asarray(dscc)
    rows = np.nonzero(live)[0]
    np.testing.assert_array_equal(
        fvc_h[rows], padded[got_ids]
    )
    np.testing.assert_array_equal(
        dscc_h[rows], np.asarray(d_desc)[got_ids]
    )


def test_fused_path_assembly_matches_oracle(rng):
    """Full fused flow (XLA pack fallback) vs oracle payloads on CPU."""
    import jax.numpy as jnp

    from cvxcompress_tpu.ops import rle_device, tokenize_pallas as tp

    n, chunk = 2, 128
    cells = tp.TR * 128  # 1 tile per block
    ncpb = cells // chunk
    nchunks = n * ncpb
    c = (rng.standard_normal((n, cells)) * 60).astype(np.float32)
    c[rng.random((n, cells)) < 0.95] = 0.0
    padded = np.zeros((tp.pad_rows(nchunks), chunk), np.float32)
    padded[:nchunks] = c.reshape(nchunks, chunk)
    fvp = jnp.asarray(padded)

    cb, sizes, raw, counts, fvc, dscc, meta = tp.tokenize_compact_fast(
        fvp, n, ncpb, chunk, interpret=True
    )
    emitted, lcount = (int(v) for v in np.asarray(counts))
    acap = rle_device.bucket(emitted)
    lcap = rle_device.bucket(lcount)
    subrows, aidx, ab = rle_device.pack_compacted(
        fvc, dscc, meta[:, :2], counts[0], acap, lcap,
        use_pallas_kernel=False,
    )
    stream, total = rle_device.assemble_payload_filtered(
        np.asarray(subrows), np.asarray(aidx), np.asarray(ab), emitted,
        np.asarray(sizes), np.asarray(raw), None, cells, chunk,
    )
    sizes_h = np.asarray(sizes)
    pos = 0
    for i in range(n):
        expect = orle.encode(np.float32(1.0), c[i])
        got = stream[pos : pos + sizes_h[i]].tobytes()
        assert got == expect, f"block {i} differs"
        pos += sizes_h[i]


def test_all_raw_volume_roundtrip(rng):
    """A volume where every block takes the raw fallback reconstructs the
    coefficients bit-exactly (raw payload bytes are the untouched f32s)."""
    vol = (rng.standard_normal((16, 16, 16)) * 1e10).astype(F32)
    data, ratio = jcodec.compress(vol, 1e-8, block=(8, 8, 8))
    hdr, blkoffs, _, _ = ctn.unpack(data)
    assert (blkoffs < 0).all(), "expected every block raw"
    assert ratio < 1.1  # raw storage + tables: no compression
    out = jcodec.decompress(data)
    err, _ = rel_error_and_snr(vol, out)
    assert err < 1e-5  # only transform forward+inverse error remains


def test_noncontiguous_and_f64_inputs():
    vol = make_radial_volume(nz=16, ny=16, nx=32)
    strided = vol[::1, ::1, ::2]  # non-contiguous view
    d1, _ = jcodec.compress(np.ascontiguousarray(strided), 1e-2, block=(8, 8, 8))
    d2, _ = jcodec.compress(strided, 1e-2, block=(8, 8, 8))
    np.testing.assert_array_equal(d1, d2)
    d3, _ = jcodec.compress(strided.astype(np.float64), 1e-2, block=(8, 8, 8))
    np.testing.assert_array_equal(d1, d3)


def _interpret_kernels(monkeypatch):
    import jax.experimental.pallas as pl

    from cvxcompress_tpu.ops import tokenize_pallas as _tp

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    # builders see interpret=False (the patch flips it inside
    # pallas_call), so their split3 gating would wrongly engage the
    # bf16-split dots on CPU — pin full-f32 dots for parity fixtures
    orig_dot3 = _tp.mxu_dot3
    monkeypatch.setattr(
        _tp, "mxu_dot3", lambda a, b, split: orig_dot3(a, b, False)
    )


@pytest.mark.parametrize(
    "shape,block,density,scale",
    [
        ((64, 96, 96), (32, 32, 32), 0.15, 30.0),   # mixed classes, sparse
        ((64, 96, 96), (32, 32, 32), 0.9, 2000.0),  # dense + raw blocks
        ((64, 64, 160), (16, 32, 32), 0.2, 30.0),   # bx=16, T>1 thirds
        ((32, 64, 96), (8, 16, 32), 0.3, 30.0),     # bx=8 (rpc=16)
        ((64, 64, 192), (64, 32, 64), 0.25, 30.0),  # bx=64, pitch=5*bx
    ],
)
def test_stripe_seg_container_parity_random(monkeypatch, rng, shape, block,
                                            density, scale):
    """The SEGMENT stripe pack emits byte-identical containers to the
    standard path on adversarial random data: every token class (incl.
    VLESC4 raw floats), zero runs straddling rows/segments/thirds,
    raw-fallback blocks, phantom x-pad columns (interpret kernels)."""
    from cvxcompress_tpu.ops import tokenize_pallas as tp

    _interpret_kernels(monkeypatch)
    assert tp.stripe_path_ok(shape, block)
    vol = (rng.standard_normal(shape) * scale).astype(np.float32)
    vol[rng.random(shape) >= density] = 0.0
    # a handful of huge values to force VLESC4 / int-range edge tokens
    flat = vol.reshape(-1)
    hot = rng.integers(0, flat.size, 50)
    flat[hot] = (rng.standard_normal(50) * 3e9).astype(np.float32)

    ref, _ = jcodec.compress(vol, 1e-2, block=block)  # standard CPU path

    monkeypatch.setenv("CVX_STRIPE", "1")
    monkeypatch.setenv("CVX_STRIPE_FUSED", "0")  # pin the staged path
    monkeypatch.setattr(jcodec, "use_pallas", lambda: True)
    assert jcodec._use_stripe_path(shape, block, False, 128) == "seg"
    got, _ = jcodec.compress(vol, 1e-2, block=block)
    np.testing.assert_array_equal(ref, got)
    # and the containers decode (host engine) to the same volume
    np.testing.assert_array_equal(
        jcodec.decompress(ref, engine="host"),
        jcodec.decompress(got, engine="host"),
    )


def test_stripe_seg_metadata_fallback_parity(monkeypatch, rng):
    """The giant-volume fallback (per-subrow metadata + host reorder,
    taken when the block-order sort key would overflow i32 —
    seg_block_order_ok) emits byte-identical containers to the default
    block-order path."""
    from cvxcompress_tpu.ops import rle_device as rd

    shape, block = (64, 96, 96), (32, 32, 32)
    _interpret_kernels(monkeypatch)
    vol = (rng.standard_normal(shape) * 30).astype(np.float32)
    vol[rng.random(shape) >= 0.2] = 0.0
    vol.reshape(-1)[rng.integers(0, vol.size, 20)] = 3e9  # raw blocks
    monkeypatch.setattr(jcodec, "use_pallas", lambda: True)
    monkeypatch.setenv("CVX_STRIPE", "1")
    monkeypatch.setenv("CVX_STRIPE_FUSED", "0")
    assert jcodec._use_stripe_path(shape, block, False, 128) == "seg"
    ref, _ = jcodec.compress(vol, 1e-2, block=block)

    # force the fallback; the jit cache keys only on plane_geom, so the
    # cached block-order trace must be dropped
    rd.pack_active_stripe_seg.clear_cache()
    monkeypatch.setattr(rd, "seg_block_order_ok", lambda g: False)
    try:
        got, _ = jcodec.compress(vol, 1e-2, block=block)
    finally:
        rd.pack_active_stripe_seg.clear_cache()
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_stripe_patch_mode_still_matches(monkeypatch, rng):
    """CVX_STRIPE=patch (the older patch-gather pack) emits byte-identical
    containers to the SEG pack — both consume the same stripe plane, so
    this is exact (the standard path's blocked einsums differ by ~1 ulp
    at truncation edges on random data and are compared elsewhere)."""
    shape, block = (64, 96, 96), (32, 32, 32)
    _interpret_kernels(monkeypatch)
    vol = (rng.standard_normal(shape) * 40).astype(np.float32)
    vol[rng.random(shape) >= 0.2] = 0.0
    monkeypatch.setattr(jcodec, "use_pallas", lambda: True)
    monkeypatch.setenv("CVX_STRIPE", "1")
    monkeypatch.setenv("CVX_STRIPE_FUSED", "0")  # pin the staged path
    assert jcodec._use_stripe_path(shape, block, False, 128) == "seg"
    ref, _ = jcodec.compress(vol, 1e-2, block=block)
    monkeypatch.setenv("CVX_STRIPE", "patch")
    assert jcodec._use_stripe_path(shape, block, False, 128) == "patch"
    got, _ = jcodec.compress(vol, 1e-2, block=block)
    np.testing.assert_array_equal(ref, got)


def test_stripe_seg_local_rms(monkeypatch, rng):
    """Local-RMS through the seg pack: mulfacs may differ from the
    block-major path by ~1 ulp (documented reduction-order deviation),
    so assert self-consistency: the container decodes to within one
    quantization step of the standard path's decode."""
    shape, block = (64, 96, 96), (32, 32, 32)
    _interpret_kernels(monkeypatch)
    vol = make_sinusoid_volume(*shape, periods=3)
    ref, _ = jcodec.compress(vol, 1e-2, block=block, use_local_rms=True)
    monkeypatch.setenv("CVX_STRIPE", "1")
    monkeypatch.setenv("CVX_STRIPE_FUSED", "0")  # pin the staged path
    monkeypatch.setattr(jcodec, "use_pallas", lambda: True)
    got, _ = jcodec.compress(vol, 1e-2, block=block, use_local_rms=True)
    a = jcodec.decompress(ref, engine="host")
    b = jcodec.decompress(got, engine="host")
    hdr = ctn.unpack(ref)[0]
    mfs = ctn.unpack(ref)[2]
    step = (1.0 / np.abs(mfs[mfs != 0])).max() if mfs is not None else 0.0
    assert np.abs(a - b).max() <= step + 1e-30


def test_stripe_fused_local_rms(monkeypatch, rng):
    """Local-RMS through the FUSED stripe kernel (per-block RMS computed
    in-VMEM between the cascades and the tokenize): self-consistent with
    the staged local path within one quantization step (the in-kernel
    sublane-sum reduction order differs from the staged jnp.sum — the
    same documented ~1 ulp mulfac deviation as staged-vs-block-major),
    and the stored blkmulfac table matches the staged one to ~1 ulp."""
    shape, block = (64, 96, 96), (32, 32, 32)
    _interpret_kernels(monkeypatch)
    vol = make_sinusoid_volume(*shape, periods=3)
    vol = vol + (rng.standard_normal(shape) * 1e-3).astype(np.float32)
    monkeypatch.setattr(jcodec, "use_pallas", lambda: True)
    monkeypatch.setenv("CVX_STRIPE", "1")
    monkeypatch.setenv("CVX_STRIPE_FUSED", "0")  # staged local path
    ref, _ = jcodec.compress(vol, 1e-2, block=block, use_local_rms=True)
    monkeypatch.setenv("CVX_STRIPE_FUSED", "1")  # fused local path
    got, _ = jcodec.compress(vol, 1e-2, block=block, use_local_rms=True)
    mref = ctn.unpack(ref)[2]
    mgot = ctn.unpack(got)[2]
    np.testing.assert_allclose(mgot, mref, rtol=1e-5)
    a = jcodec.decompress(ref, engine="host")
    b = jcodec.decompress(got, engine="host")
    step = (1.0 / np.abs(mref[mref != 0])).max()
    assert np.abs(a - b).max() <= step + 1e-30
    # and the fused-local roundtrip holds the codec's quality contract
    err = np.linalg.norm(b - vol) / np.linalg.norm(vol)
    assert err < 2e-2


def test_stripe_fused_container_parity_sinusoid(monkeypatch):
    """The fused stripe mega-kernel (x/y/z + scale + tokenize in one
    pass) emits the same container as the staged seg path on the CI
    sinusoid (values far from truncation edges; the z-then-y-then-x
    rounding order differs by ~1 ulp on adversarial data)."""
    from cvxcompress_tpu.ops import tokenize_pallas as tp

    shape, block = (64, 96, 96), (32, 32, 32)
    _interpret_kernels(monkeypatch)
    assert tp.stripe_fused_ok(shape, block)
    vol = make_sinusoid_volume(*shape, periods=3)
    monkeypatch.setattr(jcodec, "use_pallas", lambda: True)
    monkeypatch.setenv("CVX_STRIPE", "1")
    monkeypatch.setenv("CVX_STRIPE_FUSED", "0")  # pin the staged path
    ref, _ = jcodec.compress(vol, 1e-2, block=block)
    monkeypatch.setenv("CVX_STRIPE_FUSED", "1")
    got, _ = jcodec.compress(vol, 1e-2, block=block)
    np.testing.assert_array_equal(ref, got)


def test_stripe_fused_random_quality(monkeypatch, rng):
    """Fused stripe kernel on random sparse data: decodes as well as the
    staged stripe path (per-cell decode error is NOT bounded by one
    quantization step — inverse-wavelet synthesis gain amplifies the
    coefficient rounding — so compare against the staged path's decode,
    whose coefficients differ only by the z/y/x rounding order, plus the
    codec's rel-RMS contract); oracle backend decodes the container."""
    shape, block = (64, 64, 160), (16, 32, 32)
    _interpret_kernels(monkeypatch)
    vol = (rng.standard_normal(shape) * 50).astype(np.float32)
    vol[rng.random(shape) >= 0.2] = 0.0
    monkeypatch.setattr(jcodec, "use_pallas", lambda: True)
    monkeypatch.setenv("CVX_STRIPE", "1")
    monkeypatch.setenv("CVX_STRIPE_FUSED", "0")  # pin the staged path
    ref, _ = jcodec.compress(vol, 1e-2, block=block)
    monkeypatch.setenv("CVX_STRIPE_FUSED", "1")
    data, _ = jcodec.compress(vol, 1e-2, block=block)
    out = jcodec.decompress(data, engine="host")
    base = jcodec.decompress(ref, engine="host")
    hdr = ctn.unpack(data)[0]
    step = 1.0 / hdr.glob_mulfac
    # coefficients agree to <=1 quantization step (rounding-order only);
    # inverse synthesis gain per cell stays within a few steps
    assert np.abs(out - base).max() <= 4 * step
    rel = np.sqrt(np.mean((out - vol) ** 2)) / np.sqrt(np.mean(vol**2))
    rel_base = np.sqrt(np.mean((base - vol) ** 2)) / np.sqrt(np.mean(vol**2))
    assert rel <= rel_base * 1.05 + 1e-12
    out2 = ocodec.decompress(data)  # f64 oracle inverse vs host f32
    assert np.abs(out2 - out).max() <= 1e-4 * np.abs(out).max()


def test_caps_cache_overflow_repacks(monkeypatch, rng):
    """A stream whose content jumps (low-entropy volume seeds small
    cached caps, then a dense volume overflows them) must repack with
    exact caps and still emit byte-identical containers to the
    cache-free standard path."""
    shape, block = (64, 96, 96), (32, 32, 32)
    _interpret_kernels(monkeypatch)
    monkeypatch.setattr(jcodec, "use_pallas", lambda: True)
    monkeypatch.setenv("CVX_STRIPE", "1")
    monkeypatch.setenv("CVX_STRIPE_FUSED", "0")

    quiet = make_sinusoid_volume(*shape, periods=2) * 1e-3
    dense = (rng.standard_normal(shape) * 500).astype(np.float32)

    # cache-free references: exact caps from the counts readback
    jcodec._CAPS_CACHE.clear()
    ref_d, _ = jcodec.compress(dense, 1e-2, block=block)
    jcodec._CAPS_CACHE.clear()
    ref_q, _ = jcodec.compress(quiet, 1e-2, block=block)

    # stream: quiet seeds tiny cached caps, dense MUST overflow + repack
    jcodec._CAPS_CACHE.clear()
    d_q, _ = jcodec.compress(quiet, 1e-2, block=block)
    d_d, _ = jcodec.compress(dense, 1e-2, block=block)
    d_q2, _ = jcodec.compress(quiet, 1e-2, block=block)  # shrinks again

    np.testing.assert_array_equal(np.asarray(ref_q), np.asarray(d_q))
    np.testing.assert_array_equal(np.asarray(ref_d), np.asarray(d_d))
    np.testing.assert_array_equal(np.asarray(ref_q), np.asarray(d_q2))


def test_stripe_fused_inverse_matches_staged(monkeypatch, rng):
    """The fused stripe inverse kernel (x+y+z in one VMEM pass) matches
    the staged x + y/z einsum inverse within the 1e-5 transform contract
    on a random coefficient plane, including x-unpad via the clipped
    operator and z/y edge-pad clipping."""
    import jax.numpy as jnp

    from cvxcompress_tpu.ops import fused_inverse as fi
    from cvxcompress_tpu.ops import wavelet

    shape, block = (60, 90, 90), (32, 32, 32)  # unaligned on all axes
    nz, ny, nx = shape
    bx, by, bz = block
    nbz, nby, nbx = -(-nz // bz), -(-ny // by), -(-nx // bx)
    nbx2 = wavelet.padded_nbx(nbx, bx)
    nzp, nyp, W = nbz * bz, nby * by, nbx2 * bx
    assert fi.stripe_inverse_ok(shape, block)
    plane = rng.standard_normal((nzp * nyp, W)).astype(np.float32)
    # phantom x-pad columns hold zeros in real decode planes
    plane[:, nbx * bx:] = 0.0
    ref = wavelet.inverse_3d_volume(
        wavelet.apply_x_inverse_rows(jnp.asarray(plane), bx), shape, block
    )
    got = fi.stripe_fused_inverse(
        jnp.asarray(plane), shape, block, interpret=True
    )
    ref = np.asarray(ref)
    got = np.asarray(got)
    assert got.shape == ref.shape == shape
    denom = np.sqrt((ref.astype(np.float64) ** 2).mean()) + 1e-30
    rel = np.sqrt(((got - ref).astype(np.float64) ** 2).mean()) / denom
    assert rel < 1e-5, rel
