"""Native C++ host runtime vs the NumPy oracle (bit-exactness + C ABI)."""

import numpy as np
import pytest

from cvxcompress_tpu.ops import rle_host
from cvxcompress_tpu.oracle import codec as ocodec
from cvxcompress_tpu.oracle import rle as orle
from cvxcompress_tpu.oracle import wavelet as ow

from conftest import make_radial_volume, rel_error_and_snr

F32 = np.float32

pytestmark = pytest.mark.skipif(
    not rle_host.available(), reason="native toolchain unavailable"
)


@pytest.mark.parametrize("mag", [0.5, 300.0, 1e5, 1e9])
def test_encode_bit_exact(mag, rng):
    vals = (rng.standard_normal(512) * mag).astype(F32)
    vals[rng.random(512) < 0.6] = 0.0
    for mf in (1.0, 7.3, 1e-5):
        assert rle_host.encode_block(mf, vals) == orle.encode(mf, vals)


def test_decode_bit_exact(rng):
    vals = (rng.standard_normal(512) * 1e4).astype(F32)
    vals[rng.random(512) < 0.7] = 0.0
    payload = orle.encode(3.3, vals) + b"\x00" * 7
    got = rle_host.decode_block(3.3, payload, 512)
    want, _ = orle.decode(3.3, payload, 512)
    np.testing.assert_array_equal(got, want)


def test_wavelet_bit_exact_vs_oracle(rng):
    for shape in [(8, 8, 8), (16, 8, 32), (1, 16, 16)]:
        x = rng.standard_normal((3,) + shape).astype(F32)
        blocks = x.copy()
        rle_host.wav_fwd_blocks(blocks)
        for i in range(3):
            expect = ow.forward_3d(x[i])
            np.testing.assert_array_equal(
                blocks[i].view(np.uint32), expect.view(np.uint32)
            )
        inv = blocks.copy()
        rle_host.wav_inv_blocks(inv)
        for i in range(3):
            expect = ow.inverse_3d(blocks[i])
            np.testing.assert_array_equal(
                inv[i].view(np.uint32), expect.view(np.uint32)
            )


def test_batch_decode_payloads(rng):
    vol = make_radial_volume(nz=16, ny=24, nx=32)
    data, _ = ocodec.compress(vol, 1e-2, block=(8, 8, 8))
    from cvxcompress_tpu import container as ctn

    hdr, blkoffs, blkmf, base = ctn.unpack(data)
    raw = np.frombuffer(memoryview(data), dtype=np.uint8)
    cells = 512
    got = rle_host.decode_payloads(
        raw[base:], blkoffs, None, hdr.glob_mulfac, cells
    )
    # oracle per-block decode must agree exactly
    for ib in range(blkoffs.size):
        off = int(blkoffs[ib]) & 0x7FFFFFFFFFFFFFFF
        want, _ = orle.decode(hdr.glob_mulfac, raw[base + off :], cells)
        np.testing.assert_array_equal(got[ib], want)


def test_encode_payloads_matches_oracle(rng):
    coeffs = (rng.standard_normal((5, 512)) * 100).astype(F32)
    coeffs[rng.random((5, 512)) < 0.5] = 0.0
    mfs = np.full(5, 2.5, dtype=F32)
    buf, stride, sizes, raw = rle_host.encode_payloads(coeffs, mfs)
    for i in range(5):
        want = orle.encode(2.5, coeffs[i])
        assert not raw[i]
        assert buf[i, : sizes[i]].tobytes() == want


def test_host_codec_container_bit_exact_vs_oracle():
    # the native full codec shares wavelet/quantizer/entropy semantics with
    # the oracle bit-for-bit, so whole containers must be identical
    vol = make_radial_volume(nz=16, ny=24, nx=40)
    dn, rn = rle_host.host_compress(vol, 1e-2, block=(8, 8, 8))
    do, ro = ocodec.compress(vol, 1e-2, block=(8, 8, 8))
    assert dn.size == do.size
    np.testing.assert_array_equal(dn, do)
    out = rle_host.host_decompress(dn)
    want = ocodec.decompress(do)
    np.testing.assert_array_equal(out, want)


def test_host_codec_local_rms():
    vol = make_radial_volume(nz=16, ny=16, nx=16)
    dn, _ = rle_host.host_compress(vol, 1e-2, block=(8, 8, 8), use_local_rms=True)
    out = rle_host.host_decompress(dn)
    err, _ = rel_error_and_snr(vol, out)
    assert err < 1e-2


def test_c_abi_via_public_api():
    import cvxcompress_tpu as cvx

    vol = make_radial_volume(nz=16, ny=24, nx=32)
    data, ratio = cvx.compress(vol, 1e-2, block=(8, 8, 8), backend="native")
    out = cvx.decompress(data, backend="native")
    err, _ = rel_error_and_snr(vol, out)
    assert err < 1e-2
    # cross-backend: oracle decodes native containers bit-equal
    np.testing.assert_array_equal(out, ocodec.decompress(data))
