"""Sharded (multi-host dataflow) compression: byte-identical merge."""

import numpy as np
import pytest

import cvxcompress_tpu as cvx
from cvxcompress_tpu.parallel import multihost, sharded
from conftest import make_radial_volume, rel_error_and_snr


@pytest.mark.parametrize("num_shards", [1, 2, 3, 5])
def test_sharded_merge_byte_identical(num_shards):
    vol = make_radial_volume(nz=40, ny=32, nx=48)
    single, _ = cvx.compress(vol, 1e-2, block=(16, 16, 8))
    data, ratio = sharded.compress_sharded(
        vol, 1e-2, block=(16, 16, 8), num_shards=num_shards
    )
    np.testing.assert_array_equal(data, single)
    assert ratio > 1


def test_sharded_local_rms():
    vol = make_radial_volume(nz=32, ny=16, nx=16)
    single, _ = cvx.compress(vol, 1e-2, block=(8, 8, 8), use_local_rms=True)
    data, _ = sharded.compress_sharded(
        vol, 1e-2, block=(8, 8, 8), num_shards=2, use_local_rms=True
    )
    np.testing.assert_array_equal(data, single)


def test_sharded_partial_trailing_blocks():
    # nz not a multiple of bz: the last shard owns the clipped blocks
    vol = make_radial_volume(nz=21, ny=16, nx=16)
    single, _ = cvx.compress(vol, 1e-2, block=(8, 8, 8))
    data, _ = sharded.compress_sharded(vol, 1e-2, block=(8, 8, 8), num_shards=2)
    np.testing.assert_array_equal(data, single)


def test_shard_plan_properties():
    plan = sharded.plan_shards((100, 8, 8), (8, 8, 8), 4)
    assert plan[0][0] == 0 and plan[-1][1] == 100
    for (a0, a1), (b0, b1) in zip(plan, plan[1:]):
        assert a1 == b0  # contiguous
        assert a0 % 8 == 0  # block-aligned starts


def test_multihost_single_process_and_files(tmp_path):
    vol = make_radial_volume(nz=24, ny=16, nx=16)
    single, _ = cvx.compress(vol, 1e-2, block=(8, 8, 8))

    data = multihost.compress(vol, 1e-2, block=(8, 8, 8))
    np.testing.assert_array_equal(data, single)

    path = multihost.compress(
        vol, 1e-2, block=(8, 8, 8), gather="files",
        file_prefix=str(tmp_path / "seg"),
    )
    merged = multihost.merge_segment_files(
        [path], vol.shape, (8, 8, 8)
    )
    np.testing.assert_array_equal(merged, single)
    out = cvx.decompress(merged)
    err, _ = rel_error_and_snr(vol, out)
    assert err < 1e-2
