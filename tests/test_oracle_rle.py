"""Oracle entropy stage: token grammar, group fast paths, quantization."""

import numpy as np
import pytest

from cvxcompress_tpu.oracle import rle

F32 = np.float32


def roundtrip(mulfac, vals):
    vals = np.asarray(vals, dtype=F32)
    payload = rle.encode(mulfac, vals)
    out, consumed = rle.decode(mulfac, payload + b"\x00" * 7, vals.size)
    assert consumed <= len(payload)
    # decoded value must equal trunc(mulfac*val) * (1/mulfac) in f32
    fv, iv = rle.quantize(mulfac, vals)
    scalefac = F32(1.0) / F32(mulfac)
    expect = np.where(
        (iv >= -8388608) & (iv <= 8388607),
        iv.astype(F32) * scalefac,
        fv * scalefac,  # VLESC4 path stores the scaled float
    ).astype(F32)
    np.testing.assert_array_equal(out, expect)
    return payload


def test_all_zero():
    p = roundtrip(1.0, np.zeros(16, dtype=F32))
    # 16 zeros -> one RLESC1 run of 16
    assert p == bytes([127, 16])


def test_single_zero_is_plain_byte():
    vals = np.array([5, 0, 7, 1, 2, 3, 4, 6], dtype=F32)
    p = roundtrip(1.0, vals)
    # mixed path: 5, single-zero byte 0, then the rest as plain bytes
    assert p == bytes([5, 0, 7, 1, 2, 3, 4, 6])


def test_run_lengths():
    for run in (1, 2, 8, 255, 256, 300, 70000):
        n = ((run + 1 + 7) // 8) * 8
        vals = np.zeros(n, dtype=F32)
        vals[run] = 3.0  # nonzero after the run
        p = roundtrip(1.0, vals)
        if run == 1:
            assert p[0] == 0
        elif run < 256:
            assert p[0] == 127 and p[1] == run
        else:
            assert p[0] == 125
            assert int.from_bytes(p[1:4], "little") == run


def test_allbyte_group():
    vals = np.array([1, -1, 124, -124, 2, 3, 4, 5], dtype=F32)
    p = roundtrip(1.0, vals)
    assert len(p) == 8
    assert p == bytes((np.asarray(vals, np.int32) & 0xFF).astype(np.uint8))


def test_allshort_group_packed():
    # 8 short-class values, 0 byte-class -> 0+24 > 17 -> VLESC2_8x
    vals = np.array([200, -200, 300, -300, 1000, -1000, 32767, -32768], dtype=F32)
    p = roundtrip(1.0, vals)
    assert p[0] == (rle.VLESC2_8X & 0xFF)
    assert len(p) == 17
    np.testing.assert_array_equal(
        np.frombuffer(p[1:], dtype="<i2"), vals.astype(np.int16)
    )


def test_allshort_group_guard_not_taken():
    # 6 byte-class + 2 short-class: 6 + 2*3 = 12 <= 17 -> per-lane encoding
    vals = np.array([1, 2, 3, 4, 5, 6, 300, -300], dtype=F32)
    p = roundtrip(1.0, vals)
    # 6 plain bytes + 2 x (VLESC2 + i16) = 6 + 6 = 12 bytes
    assert len(p) == 12
    assert p[:6] == bytes([1, 2, 3, 4, 5, 6])
    assert p[6] == (rle.VLESC2 & 0xFF)


def test_alli3_group_packed():
    vals = np.array(
        [100000, -100000, 8388607, -8388608, 70000, -70000, 99999, -99999],
        dtype=F32,
    )
    p = roundtrip(1.0, vals)
    assert p[0] == (rle.VLESC3_8X & 0xFF)
    assert len(p) == 25


def test_float_escape():
    vals = np.array([1e9, 1, 2, 3, 4, 5, 6, 7], dtype=F32)
    p = roundtrip(1.0, vals)
    assert p[0] == (rle.VLESC4 & 0xFF)
    assert np.frombuffer(p[1:5], dtype="<f4")[0] == F32(1e9)


def test_escape_code_values_not_bytes():
    # 125, 126, 127 and -125..-128 must NOT be emitted as plain bytes
    vals = np.array([125, 126, 127, -125, -126, -127, -128, 1], dtype=F32)
    p = roundtrip(1.0, vals)
    # all 8 are short-class with only one byte-class lane -> 1 + 7*3 = 22 > 17,
    # so the group packs as VLESC2_8x; no escape-colliding plain bytes emitted
    assert p[0] == (rle.VLESC2_8X & 0xFF) and len(p) == 17

    # per-lane case: enough byte-class lanes to defeat the pack guard
    vals = np.array([125, -125, 1, 2, 3, 4, 5, 6], dtype=F32)
    p = roundtrip(1.0, vals)
    # 2 x (VLESC2 + i16) + 6 plain bytes = 12 B
    assert len(p) == 12
    assert p[0] == (rle.VLESC2 & 0xFF)


def test_quantize_truncation():
    fv, iv = rle.quantize(1.0, np.array([1.9, -1.9, 0.99, -0.99], dtype=F32))
    np.testing.assert_array_equal(iv, [1, -1, 0, 0])


def test_quantize_overflow_to_int_min():
    fv, iv = rle.quantize(1.0, np.array([3e9, -3e9, np.nan, 1.0], dtype=F32))
    assert iv[0] == rle.INT32_MIN or iv[0] == 2147483647  # classified float either way
    assert iv[2] == rle.INT32_MIN
    assert iv[3] == 1


def test_mulfac_scaling():
    vals = np.array([0.5, 1.5, 2.5, 3.5, 4.5, 5.5, 6.5, 7.5], dtype=F32)
    roundtrip(10.0, vals)  # ivals = trunc(10*v)
    roundtrip(0.1, vals)  # all quantize to zero except none
    roundtrip(1e-30, vals)
    roundtrip(1e30, vals)  # overflow -> VLESC4


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("mag", [1.0, 1e3, 1e6, 1e12])
def test_random_roundtrip(seed, mag):
    r = np.random.default_rng(seed)
    vals = (r.standard_normal(512) * mag).astype(F32)
    vals[r.random(512) < 0.5] = 0.0
    roundtrip(1.0, vals)
    roundtrip(7.3, vals)


def test_trailing_run_flushed():
    vals = np.zeros(32, dtype=F32)
    vals[0] = 9.0
    p = roundtrip(1.0, vals)
    assert p == bytes([9, 127, 31])
