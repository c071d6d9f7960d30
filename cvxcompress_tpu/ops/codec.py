"""The TPU-backed single-process codec: device compute, host container IO.

Compress pipeline (CvxCompress::Compress semantics, CvxCompress.cpp:231-427,
re-architected TPU-first):

  host:   f64 global RMS  ->  mulfac (exact reference math)
  device: block layout -> MXU wavelet -> [local RMS] -> tokenize (vectorized
          quantize+RLE) -> prefix-sum offsets -> gather compaction
  host:   sizes readback -> capacity bucket -> stream readback -> container

Decompress: container parse on host, per-block entropy decode (native C++
host decoder when built, oracle fallback), batched inverse MXU wavelet on
device, block un-layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import container as ctn
from . import blocks as blk
from . import quant, rle_device, wavelet

F32 = np.float32


@functools.partial(jax.jit, static_argnames=("use_local", "block"))
def _compress_device(vol, glob_mulfac, scale, use_local, block):
    """vol (nz,ny,nx) -> (tok, off, sizes, raw, mulfacs). All-device."""
    b = blk.to_blocks(vol, block)
    coeffs = wavelet.forward_3d(b)
    n = coeffs.shape[0]
    if use_local:
        # per-block RMS of the COEFFICIENTS (CvxCompress.cpp:343-348)
        mf = quant.mulfac_from_rms(quant.local_rms(coeffs), scale)
    else:
        mf = jnp.broadcast_to(glob_mulfac, (n,)).astype(jnp.float32)
    tok, off, sizes, raw = rle_device.encode_blocks(coeffs.reshape(n, -1), mf)
    return tok, off, sizes, raw, mf


def compress(vol, scale, block=(32, 32, 32), use_local_rms=False):
    """Compress a (nz, ny, nx) float32 volume on TPU. Returns (container, ratio)."""
    vol = np.ascontiguousarray(vol, dtype=F32)
    nz, ny, nx = vol.shape
    bx, by, bz = block
    assert ctn.is_valid_block_size(bx, by, bz), "invalid block size"
    cells = bx * by * bz

    if use_local_rms:
        glob_mulfac = F32(1.0)
    else:
        glob_mulfac = ctn.compute_glob_mulfac(quant.global_rms_host(vol), scale)

    tok, off, sizes, raw, mf = _compress_device(
        jnp.asarray(vol), jnp.float32(glob_mulfac), jnp.float32(scale),
        use_local_rms, (bx, by, bz),
    )
    sizes_h = np.asarray(sizes)
    raw_h = np.asarray(raw)
    total = int(sizes_h.sum())
    # guard the int32 indexing of the compaction kernel
    assert tok.shape[0] * cells * 5 < 2**31, "volume too large for one shard"
    cap = rle_device.bucket_cap(total)
    stream = np.asarray(rle_device.compact(tok, off, sizes, cap))[:total]

    hdr = ctn.Header(nx, ny, nz, bx, by, bz, glob_mulfac, use_local_rms)
    data = ctn.pack_stream(
        hdr, sizes_h, raw_h, stream,
        np.asarray(mf) if use_local_rms else None,
    )
    ratio = (nx * ny * nz * 4) / data.size
    return data, ratio


@functools.partial(jax.jit, static_argnames=("vol_shape", "block"))
def _decompress_device(coeff_blocks, vol_shape, block):
    out = wavelet.inverse_3d(coeff_blocks)
    return blk.from_blocks(out, vol_shape, block)


def _decode_payloads_host(data, hdr, blkoffs, blkmulfac, payload_base):
    """Entropy-decode all block payloads on host -> (nnn, cells) f32 coeffs.

    Uses the native C++ decoder when available, else the NumPy oracle.
    """
    raw = np.frombuffer(memoryview(data), dtype=np.uint8)
    nnn = hdr.grid[3]
    bx, by, bz = hdr.bx, hdr.by, hdr.bz
    cells = bx * by * bz

    try:
        from . import rle_host

        native = rle_host.available()
    except Exception:
        native = False

    if native:
        return rle_host.decode_payloads(
            raw[payload_base:], blkoffs,
            blkmulfac if hdr.use_local_rms else None,
            hdr.glob_mulfac, cells,
        )

    from ..oracle import rle as orle

    coeffs = np.empty((nnn, cells), dtype=F32)
    for ib in range(nnn):
        off = int(blkoffs[ib])
        is_raw = off < 0
        off &= 0x7FFFFFFFFFFFFFFF
        start = payload_base + off
        if is_raw:
            coeffs[ib] = raw[start : start + 4 * cells].copy().view(F32)
        else:
            mulfac = blkmulfac[ib] if hdr.use_local_rms else hdr.glob_mulfac
            coeffs[ib], _ = orle.decode(mulfac, raw[start:], cells)
    return coeffs


def decompress(data):
    """Decompress a container: host entropy decode + device inverse wavelet."""
    hdr, blkoffs, blkmulfac, payload_base = ctn.unpack(data)
    block = (hdr.bx, hdr.by, hdr.bz)
    coeffs = _decode_payloads_host(data, hdr, blkoffs, blkmulfac, payload_base)
    cb = jnp.asarray(coeffs).reshape(-1, hdr.bz, hdr.by, hdr.bx)
    vol = _decompress_device(cb, (hdr.nz, hdr.ny, hdr.nx), block)
    return np.asarray(vol)
