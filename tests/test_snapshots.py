"""Device-resident snapshot stack: quality, memory accounting, LIFO use."""

import numpy as np

from cvxcompress_tpu.snapshots import DeviceSnapshotStack
from conftest import make_radial_volume, make_sinusoid_volume, rel_error_and_snr


def test_snapshot_roundtrip_quality():
    shape = (64, 32, 32)
    store = DeviceSnapshotStack(shape, 1e-2, block=(32, 32, 32))
    vol = make_sinusoid_volume(*shape, periods=3)
    i = store.append(vol)
    out = np.asarray(store.get(i))
    err, snr = rel_error_and_snr(vol, out)
    assert err < 2e-4 and snr > 75.0
    assert store.ratio() > 5.0  # tiny volume; invmap overhead dominates


def test_snapshot_matches_codec_quality():
    # same transform + quantizer as the byte-stream codec -> same output
    import cvxcompress_tpu as cvx

    vol = make_radial_volume(nz=16, ny=32, nx=32)
    store = DeviceSnapshotStack(vol.shape, 1e-2, block=(16, 16, 16))
    store.append(vol)
    snap = np.asarray(store.get(0))
    data, _ = cvx.compress(vol, 1e-2, block=(16, 16, 16))
    codec = cvx.decompress(data)
    # mulfac differs only by f32-vs-f64 RMS accumulation; outputs agree to
    # quantizer-step precision
    err = np.abs(snap - codec).max()
    assert err < 5e-2 * np.abs(vol).max(), err


def test_snapshot_stack_lifo():
    shape = (32, 16, 16)
    store = DeviceSnapshotStack(shape, 1e-2, block=(16, 16, 16))
    vols = [make_radial_volume(*shape, seed=s) for s in range(4)]
    for v in vols:
        store.append(v)
    assert len(store) == 4
    assert store.nbytes() > 0
    for v in reversed(vols):
        out = np.asarray(store.pop())
        err, _ = rel_error_and_snr(v, out)
        assert err < 2e-2
    assert len(store) == 0


def test_snapshot_all_zero():
    shape = (16, 16, 16)
    store = DeviceSnapshotStack(shape, 1e-2, block=(16, 16, 16))
    store.append(np.zeros(shape, np.float32))
    out = np.asarray(store.get(0))
    np.testing.assert_array_equal(out, 0.0)


def test_snapshot_capacity_overflow_retry():
    """A later snapshot with more active chunks than the speculative bucket
    triggers the deferred re-sparsify (validation path)."""
    shape = (32, 32, 32)
    store = DeviceSnapshotStack(shape, 1e-2, block=(16, 16, 16),
                                max_pending=1)
    sparse = np.zeros(shape, np.float32)
    sparse[0, 0, 0] = 1.0  # tiny active set -> small first bucket
    store.append(sparse)
    dense = make_radial_volume(*shape)  # much larger active set
    store.append(dense)
    store.flush()
    out0 = np.asarray(store.get(0))
    out1 = np.asarray(store.get(1))
    err1, _ = rel_error_and_snr(dense, out1)
    assert err1 < 2e-2, err1
    assert abs(out0[0, 0, 0] - 1.0) < 1e-2
    assert np.abs(out0.ravel()[1:]).max() < 1e-2
