"""Device entropy encoder vs NumPy oracle: byte-for-byte equality."""

import jax.numpy as jnp
import numpy as np
import pytest

from cvxcompress_tpu.ops import rle_device
from cvxcompress_tpu.oracle import rle as orle

F32 = np.float32


def device_encode(coeff_blocks, mulfacs):
    """Run the full device encode path, return (list of payloads, raw flags)."""
    n, cells = coeff_blocks.shape
    chunk = rle_device.chunk_cells(cells)
    mf = np.asarray(mulfacs, dtype=F32)
    fv = jnp.asarray((coeff_blocks * mf[:, None]).astype(F32))
    desc, chunk_bytes, sizes, raw, counts = rle_device.tokenize_desc(
        rle_device.as_rows(fv), n, chunk
    )
    ncpb = cells // chunk
    cchunks = fv.reshape(n * ncpb, chunk)
    cb_h = np.asarray(chunk_bytes)
    sizes_h = np.asarray(sizes)
    raw_h = np.asarray(raw)
    acap, lcap = rle_device.plan_capacities(cb_h)
    subrows, aidx, abytes = rle_device.pack_active(
        cchunks, desc, chunk_bytes, acap, lcap
    )
    # exercise the sparse host assembly (the production path)
    acount = int(np.asarray(counts)[0])
    subrows = np.asarray(subrows)
    raw_bytes = (
        np.ascontiguousarray(coeff_blocks[raw_h], dtype=F32).view(np.uint8)
        if raw_h.any()
        else None
    )
    stream, total = rle_device.assemble_payload_sparse(
        subrows, np.asarray(aidx), np.asarray(abytes), acount,
        sizes_h, raw_h, raw_bytes, cells, chunk
    )
    # and cross-check the dense assembly agrees
    stream2, total2 = rle_device.assemble_payload(
        subrows, cb_h, sizes_h, raw_h, raw_bytes, cells, chunk
    )
    assert total2 == total
    np.testing.assert_array_equal(stream, stream2)
    out, pos = [], 0
    for s in sizes_h:
        out.append(stream[pos : pos + s].tobytes())
        pos += s
    return out, raw_h


def oracle_encode(coeff_blocks, mulfacs):
    out, raws = [], []
    cells = coeff_blocks.shape[1]
    for c, mf in zip(coeff_blocks, mulfacs):
        p = orle.encode(mf, c)
        if len(p) > 4 * cells:
            out.append(np.asarray(c, dtype=F32).tobytes())
            raws.append(True)
        else:
            out.append(p)
            raws.append(False)
    return out, np.asarray(raws)


def check(coeff_blocks, mulfacs):
    coeff_blocks = np.asarray(coeff_blocks, dtype=F32)
    mulfacs = np.asarray(mulfacs, dtype=F32)
    got, graw = device_encode(coeff_blocks, mulfacs)
    want, wraw = oracle_encode(coeff_blocks, mulfacs)
    np.testing.assert_array_equal(graw, wraw)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, (
            f"block {i}: device {len(g)}B != oracle {len(w)}B; "
            f"first diff at {next((k for k in range(min(len(g), len(w))) if g[k] != w[k]), 'len')}"
        )


def test_all_zero_blocks():
    check(np.zeros((3, 64), dtype=F32), np.ones(3, dtype=F32))


def test_single_values():
    c = np.zeros((1, 64), dtype=F32)
    c[0, 17] = 9.0
    check(c, [1.0])


def test_all_token_classes(rng):
    # craft one block exercising every token type and group mode
    vals = np.zeros(512, dtype=F32)
    vals[0:8] = [1, -1, 124, -124, 2, 3, 4, 5]  # allbyte group
    vals[8:16] = [200, -200, 300, -300, 1000, -1000, 32767, -32768]  # 8x short
    vals[16:24] = [1e5, -1e5, 8388607, -8388608, 7e4, -7e4, 99999, -99999]  # 8x i3
    vals[24:32] = [1e9, 1, 2, 0, 0, 300, 70000, 5]  # mixed with zeros + float
    vals[40] = 3.0  # run of 8 zeros then value
    vals[100:108] = [1, 2, 3, 4, 5, 6, 300, -300]  # guard-rejected short pack
    # long tail of zeros -> RLESC3
    check(vals[None, :], [1.0])


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("mag", [0.5, 100.0, 1e5, 1e8, 1e12])
def test_random_blocks(seed, mag):
    r = np.random.default_rng(seed)
    c = (r.standard_normal((4, 256)) * mag).astype(F32)
    c[r.random((4, 256)) < 0.6] = 0.0
    check(c, np.full(4, 1.0))
    check(c, np.full(4, 3.7))


def test_sparse_wavelet_like(rng):
    # realistic profile: mostly tiny values that quantize to zero
    c = (rng.standard_normal((8, 512)) * 0.3).astype(F32)
    c[:, ::37] *= 1e4
    check(c, np.full(8, 1.0))


def test_run_boundaries(rng):
    for runlen in (1, 7, 8, 9, 255, 256, 257):
        c = np.zeros((1, 512), dtype=F32)
        if runlen < 512:
            c[0, runlen] = 42.0
        check(c, [1.0])


def test_raw_fallback_blocks(rng):
    # huge mulfac forces VLESC4 floats everywhere -> raw fallback
    c = rng.standard_normal((2, 64)).astype(F32)
    check(c, np.full(2, 1e10))


def test_mixed_raw_and_compressed(rng):
    c = np.zeros((3, 64), dtype=F32)
    c[1] = rng.standard_normal(64).astype(F32) * 1e10  # raw
    c[2, ::9] = 17.0
    check(c, np.ones(3, dtype=F32))


def test_nan_and_overflow(rng):
    c = rng.standard_normal((1, 64)).astype(F32)
    c[0, 5] = np.nan
    c[0, 9] = 3e12
    c[0, 13] = -3e12
    check(c, [1.0])


def test_multiblock_offsets(rng):
    # verify the global compaction places each block at its size-prefix base
    c = (rng.standard_normal((16, 128)) * 50).astype(F32)
    c[rng.random((16, 128)) < 0.5] = 0.0
    check(c, np.full(16, 1.0))


def test_multichunk_blocks(rng):
    # cells > chunk (512): exercises the hierarchical run-carry across chunks
    c = (rng.standard_normal((3, 2048)) * 50).astype(F32)
    c[rng.random((3, 2048)) < 0.7] = 0.0
    check(c, np.full(3, 1.0))


def test_runs_crossing_chunks(rng):
    # zero runs spanning chunk boundaries, ends near boundaries
    for pos in (511, 512, 513, 1023, 1024, 1500, 2047):
        c = np.zeros((1, 2048), dtype=F32)
        c[0, pos] = 42.0
        check(c, [1.0])
    # run covering several whole chunks with values on both sides
    c = np.zeros((1, 4096), dtype=F32)
    c[0, 10] = 1.0
    c[0, 3900] = 2.0
    check(c, [1.0])


def test_inactive_interior_chunks(rng):
    # blocks whose middle chunks are entirely inside a zero run (inactive)
    c = np.zeros((4, 4096), dtype=F32)
    c[0, 0] = 5.0
    c[1, 4095] = 5.0
    c[2, 0] = 5.0
    c[2, 4095] = 5.0
    # block 3 all zero: single RLESC3 token in the last chunk
    check(c, np.full(4, 1.0))


def test_split_giant_run():
    # a zero run of exactly 2^24 cells splits into [RLESC3 0xFFFFFF][0]
    # (only reachable as an all-zero 256^3 block; use the grammar directly
    # on a smaller synthetic via the oracle comparison at 2^24 cells would
    # be too slow on CPU -- check the token stream against the oracle's
    # documented split behavior on the largest CI-fast size instead)
    c = np.zeros((1, 1 << 15), dtype=F32)
    check(c, [1.0])
