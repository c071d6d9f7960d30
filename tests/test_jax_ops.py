"""JAX ops vs the NumPy oracle: layout, wavelet, quantization."""

import jax.numpy as jnp
import numpy as np
import pytest

from cvxcompress_tpu.ops import blocks as blk
from cvxcompress_tpu.ops import quant
from cvxcompress_tpu.ops import wavelet as jw
from cvxcompress_tpu.oracle import codec as ocodec
from cvxcompress_tpu.oracle import rle as orle
from cvxcompress_tpu.oracle import wavelet as ow

F32 = np.float32


def test_to_blocks_matches_extract(rng):
    vol = rng.standard_normal((19, 27, 41)).astype(F32)
    block = (16, 16, 16)
    b = np.asarray(blk.to_blocks(jnp.asarray(vol), block))
    nbz, nby, nbx = blk.grid_shape(vol.shape, block)
    assert b.shape == (nbz * nby * nbx, 16, 16, 16)
    for ib in range(b.shape[0]):
        x0, y0, z0 = blk.block_origin(ib, vol.shape, block)
        expect = ocodec.extract_block(vol, x0, y0, z0, *block)
        np.testing.assert_array_equal(b[ib], expect, err_msg=f"block {ib}")


def test_from_blocks_roundtrip(rng):
    vol = rng.standard_normal((19, 27, 41)).astype(F32)
    block = (16, 8, 8)
    b = blk.to_blocks(jnp.asarray(vol), block)
    out = np.asarray(blk.from_blocks(b, vol.shape, block))
    np.testing.assert_array_equal(out, vol)


def test_blocks_np_twins(rng):
    vol = rng.standard_normal((10, 20, 30)).astype(F32)
    block = (8, 16, 8)
    np.testing.assert_array_equal(
        blk.to_blocks_np(vol, block), np.asarray(blk.to_blocks(jnp.asarray(vol), block))
    )
    b = blk.to_blocks_np(vol, block)
    np.testing.assert_array_equal(
        blk.from_blocks_np(b, vol.shape, block),
        np.asarray(blk.from_blocks(jnp.asarray(b), vol.shape, block)),
    )


def test_forward_matrix_matches_oracle_1d(rng):
    for n in (2, 8, 32, 64):
        x = rng.standard_normal(n).astype(F32)
        expect = ow.ds79(x)
        got = jw.forward_matrix(n) @ x.astype(np.float64)
        np.testing.assert_allclose(got, expect, rtol=2e-6, atol=2e-6)


def test_inverse_matrix_is_inverse():
    for n in (2, 8, 32, 128, 256):
        w = jw.forward_matrix(n)
        wi = jw.inverse_matrix(n)
        # the published 7/9 taps are float32 constants, biorthogonal only to
        # ~1e-7 (the reference's own roundtrip error floor)
        np.testing.assert_allclose(wi @ w, np.eye(n), atol=1e-6)


@pytest.mark.parametrize(
    "shape", [(8, 8, 8), (16, 8, 32), (32, 32, 32), (1, 16, 16)]
)
def test_forward_3d_matches_oracle(shape, rng):
    x = rng.standard_normal((4,) + shape).astype(F32)
    got = np.asarray(jw.forward_3d(jnp.asarray(x)))
    scale = np.abs(x).max() * 8  # coefficient magnitude scale
    for i in range(4):
        expect = ow.forward_3d(x[i])
        err = np.abs(got[i] - expect).max() / np.abs(expect).max()
        assert err < 1e-5, err  # the bar the reference uses slow-vs-fast


@pytest.mark.parametrize("shape", [(8, 8, 8), (32, 32, 32), (1, 16, 16)])
def test_inverse_3d_roundtrip(shape, rng):
    x = rng.standard_normal((4,) + shape).astype(F32)
    y = np.asarray(jw.inverse_3d(jw.forward_3d(jnp.asarray(x))))
    err = np.linalg.norm(y - x) / np.linalg.norm(x)
    assert err < 1e-5, err


def test_quantize_matches_oracle(rng):
    vals = (rng.standard_normal(256) * np.logspace(-3, 9, 256)).astype(F32)
    vals[::7] = 0.0
    vals[3] = np.nan
    vals[11] = 3e12  # overflow
    for mf in (1.0, 7.3, 1e-5):
        fo, io = orle.quantize(mf, vals)
        fj, ij = quant.quantize(jnp.asarray(vals)[None, :], jnp.float32(mf))
        np.testing.assert_array_equal(np.asarray(fj)[0], fo)
        np.testing.assert_array_equal(np.asarray(ij)[0], io)


def test_mulfac_guards():
    import jax.numpy as jnp

    assert float(quant.mulfac_from_rms(0.0, 1e-2)) == 1.0
    assert float(quant.mulfac_from_rms(1e-38, 1e-7)) == 1.0  # Inf guard
    assert float(quant.mulfac_from_rms(2.0, 0.5)) == 1.0


def test_global_rms_host_matches_oracle(rng):
    vol = rng.standard_normal((37, 41, 43)).astype(F32)
    assert quant.global_rms_host(vol) == ocodec.compute_global_rms(vol)
