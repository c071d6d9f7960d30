"""Sharded (multi-host) compression: z-slab shards + deterministic merge.

The reference is single-process; scaling the codec across hosts needs only
two global couplings (SURVEY.md §2): the scalar global RMS (a sum-reduce)
and the container's byte-offset table (a prefix sum over per-block sizes).
Both are associative, so multi-host compression decomposes exactly:

  1. split the volume into contiguous Z-SLABS on block boundaries — blocks
     never straddle hosts, so every block's bytes are bit-identical to the
     single-host run,
  2. all-reduce the per-slab sum of squares -> one global mulfac,
  3. each host compresses its slab into a self-contained SEGMENT (a
     regular container for the slab, using the shared mulfac),
  4. merge: rebase each segment's offset table by the running payload
     base and concatenate — byte-identical to the single-host container
     (tested in tests/test_sharded.py).

`plan_shards` / `compress_shard` / `merge_segments` are the pure,
process-local pieces; `cvxcompress_tpu.parallel.multihost` drives them
under jax.distributed.  Segments are also a practical persistence format
on their own: each host can write its segment straight to storage and the
merge is metadata-only plus streaming concatenation.
"""

from __future__ import annotations

import numpy as np

from .. import container as ctn
from ..ops import codec as _codec

F32 = np.float32


def plan_shards(vol_shape, block, num_shards):
    """Contiguous z-slab shard plan: list of (z0, z1) cell ranges.

    Slabs are multiples of bz (blocks never straddle shards); trailing
    shards may be empty for tiny volumes.
    """
    nz, _, _ = vol_shape
    bz = block[2]
    nbz = -(-nz // bz)
    per = -(-nbz // num_shards)
    plan = []
    for s in range(num_shards):
        b0, b1 = min(s * per, nbz), min((s + 1) * per, nbz)
        plan.append((b0 * bz, min(b1 * bz, nz)))
    return plan


def partial_sumsq(vol_slab):
    """f64 sum of squares of a slab (the all-reduce operand)."""
    return float(np.sum(np.square(np.asarray(vol_slab, F32), dtype=np.float64)))


def mulfac_from_sumsq(total_sumsq, total_cells, scale):
    """Global mulfac from the reduced sum of squares (reference math)."""
    rms = F32(np.sqrt(total_sumsq / total_cells))
    return ctn.compute_glob_mulfac(rms, scale)


def compress_shard(vol_slab, scale, block, glob_mulfac, use_local_rms=False):
    """Compress one z-slab into a segment (a container for the slab)."""
    data, _ = _codec.compress(
        vol_slab, scale, block=block, use_local_rms=use_local_rms,
        glob_mulfac=None if use_local_rms else glob_mulfac,
    )
    return data


def merge_segments(segments, vol_shape, block, glob_mulfac, use_local_rms):
    """Merge z-slab segments into the full-volume container.

    Byte-identical to compressing the whole volume in one process with the
    same mulfac: the block raster order (x fastest, z slowest,
    CvxCompress.cpp:321-328) makes shard block ranges contiguous, so the
    merged offset table is each segment's table rebased by the running
    payload size.
    """
    nz, ny, nx = vol_shape
    bx, by, bz = block
    hdr = ctn.Header(nx, ny, nz, bx, by, bz, F32(glob_mulfac), use_local_rms)
    nnn = hdr.grid[3]

    offs = np.empty(nnn, dtype=np.int64)
    mfs = np.empty(nnn, dtype=F32) if use_local_rms else None
    payloads = []
    pos = 0
    base = np.int64(0)
    for seg in segments:
        shdr, soffs, smf, pbase = ctn.unpack(seg)
        assert (shdr.nx, shdr.ny) == (nx, ny) and (
            shdr.bx, shdr.by, shdr.bz
        ) == (bx, by, bz)
        snnn = shdr.grid[3]
        raw_bits = soffs & ctn.RAW_FLAG
        plain = soffs & ~ctn.RAW_FLAG
        offs[pos : pos + snnn] = (plain + base) | raw_bits
        if use_local_rms:
            mfs[pos : pos + snnn] = smf
        payload = np.asarray(seg, np.uint8)[
            pbase : seg.size - ctn.SLACK_BYTES
        ]
        payloads.append(payload)
        base += payload.size
        pos += snnn
    assert pos == nnn, (pos, nnn)

    stream = np.concatenate(payloads) if payloads else np.zeros(0, np.uint8)
    sizes = np.diff(np.r_[(offs & ~ctn.RAW_FLAG), base])
    # pack_stream recomputes offsets from sizes; equivalent by construction
    return ctn.pack_stream(hdr, sizes, offs < 0, stream, mfs)


def compress_sharded(vol, scale, block=(32, 32, 32), num_shards=2,
                     use_local_rms=False):
    """Single-process reference driver for the sharded path (tests/demos).

    Runs the exact multi-host dataflow — partial sumsq reduce, per-shard
    compress, merge — in one process.
    """
    vol = np.ascontiguousarray(vol, dtype=F32)
    plan = plan_shards(vol.shape, block, num_shards)
    if use_local_rms:
        glob_mulfac = F32(1.0)
    else:
        total = sum(partial_sumsq(vol[z0:z1]) for z0, z1 in plan)
        glob_mulfac = mulfac_from_sumsq(total, vol.size, scale)
    segments = [
        compress_shard(vol[z0:z1], scale, block, glob_mulfac, use_local_rms)
        for z0, z1 in plan
        if z1 > z0
    ]
    data = merge_segments(
        segments, vol.shape, block, glob_mulfac, use_local_rms
    )
    ratio = vol.size * 4 / data.size
    return data, ratio
