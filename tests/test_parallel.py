"""Multi-chip sharded codec on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from cvxcompress_tpu.ops import codec as jcodec
from cvxcompress_tpu.parallel import compress as pcompress
from cvxcompress_tpu.parallel import mesh as meshlib

from conftest import make_radial_volume, make_sinusoid_volume, rel_error_and_snr

F32 = np.float32

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device mesh"
)


def test_virtual_mesh_present():
    assert len(jax.devices()) == 8  # conftest forces 8 virtual CPU devices


def test_sharded_container_bit_identical_to_single_chip():
    vol = make_radial_volume(nz=20, ny=24, nx=40)
    mesh = meshlib.make_mesh()
    dp, rp = pcompress.compress(vol, 1e-2, block=(8, 8, 8), mesh=mesh)
    ds, rs = jcodec.compress(vol, 1e-2, block=(8, 8, 8))
    assert dp.size == ds.size
    np.testing.assert_array_equal(dp, ds)
    assert rp == rs


def test_sharded_container_identical_across_mesh_sizes():
    vol = make_sinusoid_volume(64, 32, 32, periods=2)
    outs = []
    for n in (1, 2, 4, 8):
        mesh = meshlib.make_mesh(jax.devices()[:n])
        d, _ = pcompress.compress(vol, 1e-2, block=(32, 32, 32), mesh=mesh)
        outs.append(d)
    for d in outs[1:]:
        np.testing.assert_array_equal(d, outs[0])


def test_sharded_roundtrip_quality():
    vol = make_sinusoid_volume(96, 64, 64, periods=3)
    mesh = meshlib.make_mesh()
    data, ratio = pcompress.compress(vol, 1e-2, block=(32, 32, 32), mesh=mesh)
    out = pcompress.decompress(data, mesh=mesh)
    err, snr = rel_error_and_snr(vol, out)
    assert err < 2e-4 and snr > 75.0
    assert ratio > 500


def test_sharded_decompress_matches_single_chip():
    vol = make_radial_volume(nz=16, ny=24, nx=24)
    data, _ = jcodec.compress(vol, 1e-2, block=(8, 8, 8))
    mesh = meshlib.make_mesh()
    out_p = pcompress.decompress(data, mesh=mesh)
    out_s = jcodec.decompress(data)
    # the sharded path runs the block-major inverse, the single-chip path
    # the volume-order engine: same operators, different einsum shapes —
    # agreement to matmul rounding, like any cross-engine pair
    denom = np.sqrt(np.mean(out_s.astype(np.float64) ** 2)) + 1e-30
    rel = np.sqrt(np.mean((out_p - out_s).astype(np.float64) ** 2)) / denom
    assert rel < 1e-6, rel


def test_sharded_local_rms():
    vol = make_radial_volume(nz=16, ny=16, nx=32)
    mesh = meshlib.make_mesh()
    dp, _ = pcompress.compress(
        vol, 1e-2, block=(8, 8, 8), use_local_rms=True, mesh=mesh
    )
    ds, _ = jcodec.compress(vol, 1e-2, block=(8, 8, 8), use_local_rms=True)
    np.testing.assert_array_equal(dp, ds)
    out = pcompress.decompress(dp, mesh=mesh)
    err, _ = rel_error_and_snr(vol, out)
    assert err < 1e-2


def test_distributed_sumsq_matches_host():
    from cvxcompress_tpu.ops import quant

    vol = make_radial_volume(nz=16, ny=16, nx=64).ravel()
    # pad to divide across devices
    mesh = meshlib.make_mesh()
    v = jax.device_put(
        vol, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("blocks"))
    )
    got = float(pcompress.distributed_sumsq(v, mesh))
    want = float(np.sum(np.square(vol, dtype=np.float64)))
    assert abs(got - want) / want < 1e-5


def test_pad_blocks_roundtrip():
    # nnn (=6 blocks) not divisible by 8 devices exercises the pad path
    vol = make_radial_volume(nz=8, ny=16, nx=24)
    mesh = meshlib.make_mesh()
    dp, _ = pcompress.compress(vol, 1e-2, block=(8, 8, 8), mesh=mesh)
    ds, _ = jcodec.compress(vol, 1e-2, block=(8, 8, 8))
    np.testing.assert_array_equal(dp, ds)


def test_sharded_decompress_uses_device_parse(rng):
    """Multi-chip decompress engages the per-shard device entropy parse
    (plan succeeds) and matches the single-chip engine; raw-fallback
    containers take the host-decode path and still match."""
    vol = make_radial_volume(nz=32, ny=24, nx=24)
    data, _ = jcodec.compress(vol, 1e-2, block=(8, 8, 8))
    mesh = meshlib.make_mesh()
    n = mesh.devices.size
    hdr = jcodec.ctn.unpack(data)[0]
    sp = pcompress._shard_decode_plan(data, hdr.grid[3], 512, n)
    assert sp is not None  # the device-parse plan engages
    out_p = pcompress.decompress(data, mesh=mesh)
    out_s = jcodec.decompress(data)
    denom = np.sqrt(np.mean(out_s.astype(np.float64) ** 2)) + 1e-30
    rel = np.sqrt(np.mean((out_p - out_s).astype(np.float64) ** 2)) / denom
    assert rel < 1e-6, rel

    # raw-fallback container: host path, same answer
    big = (rng.standard_normal((16, 16, 32)) * 1e9).astype(np.float32)
    dr, _ = jcodec.compress(big, 1e-9, block=(8, 8, 8))
    assert pcompress._shard_decode_plan(
        dr, jcodec.ctn.unpack(dr)[0].grid[3], 512, n
    ) is None
    a = pcompress.decompress(dr, mesh=mesh)
    b = jcodec.decompress(dr)
    rel = np.sqrt(np.mean((a - b).astype(np.float64) ** 2)) / (
        np.sqrt(np.mean(b.astype(np.float64) ** 2)) + 1e-30
    )
    assert rel < 1e-6, rel


def test_sharded_decode_subsegment_balanced_skew(rng):
    """Skewed payload distributions get subsegment-balanced shard
    boundaries: no chip pays a worst-shard parse cost ~n_shards times the
    mean (the round-2 plan padded every shard to the LARGEST shard's
    block-count slice).  Output still matches the single-chip engine."""
    from cvxcompress_tpu.ops import entropy_decode as ed

    # all payload mass in the low-z third of the volume
    vol = np.zeros((48, 16, 16), np.float32)
    vol[:16] = rng.standard_normal((16, 16, 16)).astype(np.float32) * 100
    vol[16:] += 1e-6  # quantizes to zero everywhere else
    data, _ = jcodec.compress(vol, 1e-1, block=(8, 8, 8))
    mesh = meshlib.make_mesh()
    n = mesh.devices.size
    if n < 2:
        return
    hdr = jcodec.ctn.unpack(data)[0]
    sp = pcompress._shard_decode_plan(data, hdr.grid[3], 512, n)
    assert sp is not None
    # per-shard real subsegment counts (rows with a local block id < bps)
    counts = (sp["sblk"] < sp["bps"]).sum(axis=1)
    mean = counts.sum() / n
    assert counts.max() <= max(2 * mean, counts.sum() / (n - 0.5) + ed.SPS), (
        counts.tolist()
    )
    # block boundaries are non-uniform under skew (balance happened)
    assert np.diff(sp["bstart"]).max() > np.diff(sp["bstart"]).min()
    out_p = pcompress.decompress(data, mesh=mesh)
    out_s = jcodec.decompress(data)
    denom = np.sqrt(np.mean(out_s.astype(np.float64) ** 2)) + 1e-30
    rel = np.sqrt(np.mean((out_p - out_s).astype(np.float64) ** 2)) / denom
    assert rel < 1e-6, rel
