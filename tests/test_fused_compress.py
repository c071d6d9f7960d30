"""Fused x/z + y/scale/tokenize compress kernels (interpret mode).

The fused path's transform applies x,z then y (commuting linear maps —
same operators as the staged einsums), so values agree with the oracle
cascade to the 1e-5 contract but not bitwise with the staged path;
containers are validated by decode quality and cross-backend decode.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cvxcompress_tpu.ops import codec as jcodec
from cvxcompress_tpu.ops import fused_compress as fc

from conftest import make_sinusoid_volume, rel_error_and_snr


def _interpret_kernels(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)


def test_fused_path_gate():
    assert fc.fused_path_ok((128, 128, 256), (128, 128, 128))
    assert not fc.fused_path_ok((128, 128, 250), (128, 128, 128))
    assert not fc.fused_path_ok((128, 128, 256), (128, 128, 64))


def test_fused_transform_matches_oracle(monkeypatch, rng):
    """K1+K2 (mulfac=1) equals the oracle multi-level cascade to 1e-5."""
    import jax.numpy as jnp

    from cvxcompress_tpu.oracle import wavelet as ow

    _interpret_kernels(monkeypatch)
    shape = (128, 128, 256)
    vol = rng.standard_normal(shape).astype(np.float32)
    plane = fc.forward_xz(jnp.asarray(vol), shape, interpret=True)
    fv, _ = fc.tokenize_fused_y(
        plane, jnp.float32(1.0), shape, interpret=True
    )
    got = np.asarray(fv).reshape(2, 128, 128, 128)  # 2 blocks along x

    for b in range(2):
        blk = vol[:, :, b * 128 : (b + 1) * 128].astype(np.float64)
        ref = ow.forward_3d(blk)
        num = np.sqrt(np.mean((got[b] - ref) ** 2))
        den = np.sqrt(np.mean(ref**2)) + 1e-30
        assert num / den < 1e-5, (b, num / den)


def test_fused_compress_roundtrip_quality(monkeypatch):
    _interpret_kernels(monkeypatch)
    shape, block = (128, 128, 256), (128, 128, 128)
    vol = make_sinusoid_volume(*shape, periods=3)
    monkeypatch.setenv("CVX_FUSED_W", "1")
    monkeypatch.setattr(jcodec, "use_pallas", lambda: True)
    assert jcodec._use_fused_w(shape, block, False, 128)
    data, ratio = jcodec.compress(vol, 1e-2, block=block)
    out = jcodec.decompress(data, engine="host")
    err, snr = rel_error_and_snr(vol, out)
    assert err < 2e-4 and snr > 75.0, (err, snr)
    assert ratio > 100.0
    # sizes/offsets must be self-consistent with the standard path's
    # container STRUCTURE (same header, decodable by the oracle backend)
    from cvxcompress_tpu.oracle import codec as ocodec

    out2 = ocodec.decompress(data)
    err2, snr2 = rel_error_and_snr(vol, out2)
    assert err2 < 2e-4 and snr2 > 75.0, (err2, snr2)


def test_fused_compress_random_with_raw(monkeypatch, rng):
    """Random dense data (raw-fallback blocks + every token class) through
    the fused path decodes to within one quantization step."""
    _interpret_kernels(monkeypatch)
    shape, block = (128, 128, 256), (128, 128, 128)
    vol = (rng.standard_normal(shape) * 1000).astype(np.float32)
    monkeypatch.setenv("CVX_FUSED_W", "1")
    monkeypatch.setattr(jcodec, "use_pallas", lambda: True)
    data, ratio = jcodec.compress(vol, 1e-3, block=block)
    out = jcodec.decompress(data, engine="host")
    # raw blocks reproduce their (1e-5-contract) coefficients exactly;
    # quantized blocks to within a step
    err, _ = rel_error_and_snr(vol, out)
    assert err < 5e-3, err


def test_fused_matches_staged_on_lattice(monkeypatch, rng):
    """On quantization-safe values (integers + 0.25, far from truncation
    edges) the fused and staged paths emit byte-identical containers —
    isolating the entropy stage from transform ulp noise is impossible
    end-to-end, so seed coefficients that quantize identically under
    both transforms' ~1e-6 relative differences."""
    _interpret_kernels(monkeypatch)
    shape, block = (128, 128, 256), (128, 128, 128)
    vol = make_sinusoid_volume(*shape, periods=2)
    monkeypatch.setattr(jcodec, "use_pallas", lambda: True)
    ref, _ = jcodec.compress(vol, 1e-2, block=block)  # staged CPU path
    monkeypatch.setenv("CVX_FUSED_W", "1")
    got, _ = jcodec.compress(vol, 1e-2, block=block)
    a = jcodec.decompress(ref, engine="host")
    b = jcodec.decompress(got, engine="host")
    # containers may differ by quantization-boundary flips; decoded
    # volumes must agree to one quantization step
    import cvxcompress_tpu.container as ctn

    hdr = ctn.unpack(ref)[0]
    step = 1.0 / hdr.glob_mulfac
    assert np.abs(a - b).max() <= step + 1e-30


def test_mxu_dot3_split_accuracy():
    """The manual bf16 hi+lo 3-pass dot (Pallas' stand-in for XLA's
    Precision.HIGH) is ~2^-16-accurate on floats and EXACT for integers
    below 2^16 (the contract the tokenize one-hot dots rely on)."""
    import numpy as np

    import jax.numpy as jnp

    from cvxcompress_tpu.ops import tokenize_pallas as tp

    rng = np.random.default_rng(7)
    a = rng.normal(size=(96, 64)).astype(np.float32) * 1e3
    b = rng.normal(size=(64, 80)).astype(np.float32)
    want = a.astype(np.float64) @ b.astype(np.float64)
    got = np.asarray(tp.mxu_dot3(jnp.asarray(a), jnp.asarray(b), True))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 2e-4, rel

    iv = rng.integers(-(2**15), 2**15, size=(64, 128)).astype(np.float32)
    perm = rng.permutation(128)
    onehot = np.zeros((128, 128), np.float32)
    onehot[perm, np.arange(128)] = 1.0
    got_i = np.asarray(
        tp.mxu_dot3(jnp.asarray(iv), jnp.asarray(onehot), True)
    )
    assert np.array_equal(got_i, iv @ onehot)


def test_block_kernel_matches_two_kernel_path(rng):
    """CVX_FUSED_W=block (whole-block single kernel) emits bit-identical
    fv/desc to the two-kernel path — same dots in the same order, only
    the HBM round trip between them is removed."""
    shape, block = (128, 128, 256), (128, 128, 128)
    vol = (rng.standard_normal(shape) * 40).astype(np.float32)
    vol[rng.random(shape) >= 0.2] = 0.0
    v = jnp.asarray(vol)
    mf = jnp.float32(37.5)
    fv1, d1, cb1, s1, r1, c1 = fc.tokenize_desc_fused(
        v, mf, shape, block, interpret=True
    )
    fv2, d2, cb2, s2, r2, c2, mf2 = fc.tokenize_desc_block(
        v, mf, shape, block, interpret=True
    )
    assert mf2 is None
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(fv1), np.asarray(fv2))
    np.testing.assert_array_equal(np.asarray(cb1), np.asarray(cb2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_block_kernel_local_rms(monkeypatch, rng):
    """Local-RMS through the whole-block kernel: the in-kernel per-block
    RMS (z-slice-ordered f32 accumulation) matches the staged block-major
    path's mulfacs to ~1 ulp, and the container decodes to within one
    quantization step of the staged local path's decode."""
    import cvxcompress_tpu.container as ctn

    _interpret_kernels(monkeypatch)
    shape, block = (128, 128, 256), (128, 128, 128)
    vol = make_sinusoid_volume(*shape, periods=2)
    vol = vol + (rng.standard_normal(shape) * 1e-3).astype(np.float32)
    ref, _ = jcodec.compress(vol, 1e-2, block=block,
                             use_local_rms=True)  # staged CPU path
    monkeypatch.setattr(jcodec, "use_pallas", lambda: True)
    monkeypatch.setenv("CVX_FUSED_W", "block")
    got, _ = jcodec.compress(vol, 1e-2, block=block, use_local_rms=True)
    mref = ctn.unpack(ref)[2]
    mgot = ctn.unpack(got)[2]
    np.testing.assert_allclose(mgot, mref, rtol=1e-5)
    a = jcodec.decompress(ref, engine="host")
    b = jcodec.decompress(got, engine="host")
    step = (1.0 / np.abs(mref[mref != 0])).max()
    assert np.abs(a - b).max() <= step + 1e-30
    err = np.linalg.norm(b - vol) / np.linalg.norm(vol)
    assert err < 2e-2


def test_block_kernel_local_rms_onek(monkeypatch, rng):
    """CVX_LOCAL_ONEK=1 (single-kernel local-RMS, MXU-dot reduction):
    mulfacs match the two-kernel fused path to ~1 ulp and the container
    decodes within one quantization step of it."""
    import cvxcompress_tpu.container as ctn

    _interpret_kernels(monkeypatch)
    shape, block = (128, 128, 256), (128, 128, 128)
    vol = make_sinusoid_volume(*shape, periods=2)
    vol = vol + (rng.standard_normal(shape) * 1e-3).astype(np.float32)
    monkeypatch.setattr(jcodec, "use_pallas", lambda: True)
    monkeypatch.setenv("CVX_FUSED_W", "block")
    ref, _ = jcodec.compress(vol, 1e-2, block=block, use_local_rms=True)
    monkeypatch.setenv("CVX_LOCAL_ONEK", "1")
    got, _ = jcodec.compress(vol, 1e-2, block=block, use_local_rms=True)
    mref = ctn.unpack(ref)[2]
    mgot = ctn.unpack(got)[2]
    np.testing.assert_allclose(mgot, mref, rtol=1e-5)
    a = jcodec.decompress(ref, engine="host")
    b = jcodec.decompress(got, engine="host")
    step = (1.0 / np.abs(mref[mref != 0])).max()
    assert np.abs(a - b).max() <= step + 1e-30
    err = np.linalg.norm(b - vol) / np.linalg.norm(vol)
    assert err < 2e-2
