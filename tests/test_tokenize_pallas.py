"""Pallas tokenize kernel vs the XLA tokenize (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cvxcompress_tpu.ops import rle_device, tokenize_pallas as tp

F32 = np.float32


def run_both(coeffs, mulfacs):
    """coeffs (N, cells); returns (xla outputs, pallas outputs)."""
    n, cells = coeffs.shape
    chunk = rle_device.chunk_cells(cells)
    assert chunk == tp.LANES
    ncpb = cells // chunk
    nchunks = n * ncpb
    fv = (coeffs.reshape(n, cells) * np.asarray(mulfacs, F32)[:, None]).astype(
        F32
    )
    xla = rle_device.tokenize_desc(
        rle_device.as_rows(jnp.asarray(fv)), n, chunk
    )
    fvc = fv.reshape(nchunks, chunk)
    padded = np.zeros((tp.pad_rows(nchunks), chunk), dtype=F32)
    padded[:nchunks] = fvc
    pal = tp.tokenize_desc_fast(
        jnp.asarray(padded), n, ncpb, chunk, interpret=True
    )
    return xla, pal


def assert_equal(coeffs, mulfacs):
    xla, pal = run_both(coeffs, mulfacs)
    names = ["desc", "chunk_bytes", "sizes", "raw", "counts"]
    for nm, a, b in zip(names, xla, pal):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=nm
        )


def test_kernel_matches_xla_random(rng):
    c = (rng.standard_normal((3, 2048)) * 100).astype(F32)
    c[rng.random(c.shape) < 0.7] = 0.0
    assert_equal(c, np.full(3, 1.0))


def test_kernel_matches_xla_runs(rng):
    # runs crossing rows, tiles and block boundaries
    c = np.zeros((2, 4096), dtype=F32)
    c[0, 10] = 5.0
    c[0, 4000] = 2.0
    c[1, 0] = 1.0
    assert_equal(c, np.full(2, 1.0))


def test_kernel_matches_xla_classes(rng):
    vals = np.zeros((1, 512), dtype=F32)
    vals[0, 0:8] = [1, -1, 124, -124, 2, 3, 4, 5]
    vals[0, 8:16] = [200, -200, 300, -300, 1000, -1000, 32767, -32768]
    vals[0, 16:24] = [1e5, -1e5, 8388607, -8388608, 7e4, -7e4, 99999, -99999]
    vals[0, 24:32] = [1e9, 1, 2, 0, 0, 300, 70000, 5]
    vals[0, 100] = np.nan
    vals[0, 101] = 3e12
    assert_equal(vals, [1.0])


def test_kernel_matches_xla_multiblock(rng):
    # many small blocks -> block resets inside one kernel tile
    c = (rng.standard_normal((16, 128)) * 50).astype(F32)
    c[rng.random(c.shape) < 0.5] = 0.0
    assert_equal(c, np.full(16, 1.0))


def test_kernel_tile_boundary(rng):
    # > TR chunks so the SMEM carry crosses a grid step (interpret mode):
    # 1 block of TR*2 chunks = 2 tiles
    cells = tp.TR * 2 * tp.LANES
    c = np.zeros((1, cells), dtype=F32)
    c[0, 5] = 7.0  # run spans the tile boundary
    c[0, cells - 1] = 3.0
    assert_equal(c, [1.0])
