"""ctypes bindings to the native host runtime (native/libcvxhost.so).

The native library provides the multi-threaded host entropy decoder/encoder,
the scalar wavelet, the f64 RMS reduction, and the reference-compatible
C ABI (cvx_compress / cvx_decompress_* mirroring CvxCompress.hxx:139-192).
Builds on demand with `make -C native`; all callers gracefully fall back to
the NumPy oracle when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libcvxhost.so"))

_lib = None
_lock = threading.Lock()
_build_failed = False

F32 = np.float32
_f32p = ctypes.POINTER(ctypes.c_float)
_u8p = ctypes.POINTER(ctypes.c_uint8)
_i64p = ctypes.POINTER(ctypes.c_int64)
_u32p = ctypes.POINTER(ctypes.c_uint32)


def _build():
    src = os.path.join(_NATIVE_DIR, "cvx_host.cpp")
    if not os.path.exists(src):
        return False
    # cross-PROCESS lock (pytest-xdist workers, parallel tools): two
    # concurrent `make` runs would race on the .so
    import fcntl
    import tempfile

    lockpath = os.path.join(tempfile.gettempdir(), "cvxhost_build.lock")
    with open(lockpath, "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        try:
            if os.path.exists(_SO_PATH):
                return True
            res = subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR), "-s"],
                capture_output=True,
            )
        finally:
            fcntl.flock(lf, fcntl.LOCK_UN)
    return res.returncode == 0 and os.path.exists(_SO_PATH)


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if os.environ.get("CVX_NATIVE") == "0":  # failure-isolation switch
            _build_failed = True
            return None
        if not os.path.exists(_SO_PATH) and not _build():
            _build_failed = True
            return None
        lib = ctypes.CDLL(_SO_PATH)
        lib.cvx_rle_encode_block.restype = ctypes.c_int64
        lib.cvx_rle_encode_block.argtypes = [
            ctypes.c_float, _f32p, ctypes.c_int64, _u8p,
        ]
        lib.cvx_rle_decode_block.restype = ctypes.c_int64
        lib.cvx_rle_decode_block.argtypes = [
            ctypes.c_float, _u8p, ctypes.c_int64, _f32p, ctypes.c_int64,
        ]
        lib.cvx_decode_payloads.restype = ctypes.c_int
        lib.cvx_decode_payloads.argtypes = [
            _u8p, ctypes.c_int64, _i64p, _f32p, ctypes.c_float,
            ctypes.c_int64, ctypes.c_int64, _f32p,
        ]
        lib.cvx_encode_payloads.restype = None
        lib.cvx_encode_payloads.argtypes = [
            _f32p, _f32p, ctypes.c_int64, ctypes.c_int64, _u8p, _i64p, _u8p,
        ]
        lib.cvx_sumsq_f64.restype = ctypes.c_double
        lib.cvx_sumsq_f64.argtypes = [_f32p, ctypes.c_int64]
        lib.cvx_ragged_copy.restype = None
        lib.cvx_ragged_copy.argtypes = [
            _u8p, _i64p, _u8p, _i64p, _i64p, ctypes.c_int64,
        ]
        lib.cvx_ragged_copy_fill.restype = None
        lib.cvx_ragged_copy_fill.argtypes = [
            _u8p, _i64p, _u8p, _i64p, _i64p, ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.cvx_chunk_flags.restype = None
        lib.cvx_chunk_flags.argtypes = [
            _f32p, ctypes.c_int64, ctypes.c_int64, _u8p,
        ]
        lib.cvx_wav_fwd_blocks.restype = None
        lib.cvx_wav_fwd_blocks.argtypes = [
            _f32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.cvx_wav_inv_blocks.restype = None
        lib.cvx_wav_inv_blocks.argtypes = list(lib.cvx_wav_fwd_blocks.argtypes)
        lib.cvx_compress.restype = ctypes.c_float
        lib.cvx_compress.argtypes = [
            ctypes.c_float, _f32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            _u32p, ctypes.POINTER(ctypes.c_long),
        ]
        lib.cvx_decompress_inplace.restype = None
        lib.cvx_decompress_inplace.argtypes = [
            _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            _u32p, ctypes.c_long,
        ]
        lib.cvx_compress_th.restype = ctypes.c_float
        lib.cvx_compress_th.argtypes = [
            ctypes.c_float, _f32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_bool, _u32p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.cvx_decompress_inplace_th.restype = None
        lib.cvx_decompress_inplace_th.argtypes = [
            _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            _u32p, ctypes.c_int, ctypes.c_long,
        ]
        lib.cvx_compress_parity_th.restype = ctypes.c_float
        lib.cvx_compress_parity_th.argtypes = list(lib.cvx_compress_th.argtypes)
        lib.cvx_decompress_inplace_parity_th.restype = None
        lib.cvx_decompress_inplace_parity_th.argtypes = list(
            lib.cvx_decompress_inplace_th.argtypes
        )
        _lib = lib
        return _lib


def available():
    return _load() is not None


def _fp(a):
    return a.ctypes.data_as(_f32p)


def decode_block(mulfac, stream, cells):
    """Decode one block payload -> (cells,) float32.

    Raises ValueError on a truncated/overrunning stream.
    """
    lib = _load()
    out = np.empty(int(cells), dtype=F32)
    s = np.ascontiguousarray(np.frombuffer(memoryview(stream), dtype=np.uint8))
    rc = lib.cvx_rle_decode_block(
        ctypes.c_float(float(mulfac)), s.ctypes.data_as(_u8p), s.size,
        _fp(out), int(cells),
    )
    if rc < 0:
        raise ValueError("truncated RLE stream")
    return out


def encode_block(mulfac, vals):
    """Encode one block of float32 values -> bytes."""
    lib = _load()
    vals = np.ascontiguousarray(vals, dtype=F32).ravel()
    out = np.empty(5 * vals.size + 8, dtype=np.uint8)
    n = lib.cvx_rle_encode_block(
        ctypes.c_float(float(mulfac)), _fp(vals), vals.size,
        out.ctypes.data_as(_u8p),
    )
    return out[:n].tobytes()


def decode_payloads(payload, blkoffs, blkmulfac, glob_mulfac, cells):
    """Decode all block payloads (parallel, native) -> (nnn, cells) f32.

    Decoding is bounded by the payload buffer; raises ValueError when any
    block's stream is truncated or overruns it.
    """
    lib = _load()
    payload = np.ascontiguousarray(payload, dtype=np.uint8)
    blkoffs = np.ascontiguousarray(blkoffs, dtype=np.int64)
    nnn = blkoffs.size
    out = np.empty((nnn, int(cells)), dtype=F32)
    mfp = (
        np.ascontiguousarray(blkmulfac, dtype=F32).ctypes.data_as(_f32p)
        if blkmulfac is not None
        else ctypes.cast(None, _f32p)
    )
    rc = lib.cvx_decode_payloads(
        payload.ctypes.data_as(_u8p), payload.size,
        blkoffs.ctypes.data_as(_i64p), mfp,
        ctypes.c_float(float(glob_mulfac)), nnn, int(cells), _fp(out),
    )
    if rc != 0:
        raise ValueError("corrupt container: block stream truncated")
    return out


def encode_payloads(coeffs, mulfacs):
    """Encode (nnn, cells) coefficients -> (buf, stride, sizes, raw_flags).

    Raw-fallback blocks already contain the coefficient bytes in `buf`.
    """
    lib = _load()
    coeffs = np.ascontiguousarray(coeffs, dtype=F32)
    nnn, cells = coeffs.shape
    mulfacs = np.ascontiguousarray(mulfacs, dtype=F32)
    stride = 5 * cells + 8
    buf = np.empty((nnn, stride), dtype=np.uint8)
    sizes = np.empty(nnn, dtype=np.int64)
    raw = np.empty(nnn, dtype=np.uint8)
    lib.cvx_encode_payloads(
        _fp(coeffs), _fp(mulfacs), nnn, cells, buf.ctypes.data_as(_u8p),
        sizes.ctypes.data_as(_i64p), raw.ctypes.data_as(_u8p),
    )
    return buf, stride, sizes, raw.astype(bool)


def ragged_copy(src, soff, dst, doff, nbytes):
    """n independent memcpys dst[doff[i]:+nbytes[i]] = src[soff[i]:+...]."""
    lib = _load()
    soff = np.ascontiguousarray(soff, dtype=np.int64)
    doff = np.ascontiguousarray(doff, dtype=np.int64)
    nb = np.ascontiguousarray(nbytes, dtype=np.int64)
    lib.cvx_ragged_copy(
        src.ctypes.data_as(_u8p), soff.ctypes.data_as(_i64p),
        dst.ctypes.data_as(_u8p), doff.ctypes.data_as(_i64p),
        nb.ctypes.data_as(_i64p), soff.size,
    )


def ragged_copy_fill(src, soff, dst, doff, nbytes, align):
    """ragged_copy + zero-fill of each span's tail up to `align` (pow2)."""
    lib = _load()
    soff = np.ascontiguousarray(soff, dtype=np.int64)
    doff = np.ascontiguousarray(doff, dtype=np.int64)
    nb = np.ascontiguousarray(nbytes, dtype=np.int64)
    lib.cvx_ragged_copy_fill(
        src.ctypes.data_as(_u8p), soff.ctypes.data_as(_i64p),
        dst.ctypes.data_as(_u8p), doff.ctypes.data_as(_i64p),
        nb.ctypes.data_as(_i64p), soff.size, align,
    )


def chunk_flags(coeffs, chunk):
    """Per-chunk nonzero flags of a dense (nnn, cells) f32 buffer (native)."""
    lib = _load()
    c = np.ascontiguousarray(coeffs, dtype=F32)
    nchunks = c.size // int(chunk)
    flags = np.empty(nchunks, dtype=np.uint8)
    lib.cvx_chunk_flags(_fp(c), nchunks, int(chunk),
                        flags.ctypes.data_as(_u8p))
    return flags.astype(bool)


def sumsq_f64(vol):
    lib = _load()
    v = np.ascontiguousarray(vol, dtype=F32)
    return float(lib.cvx_sumsq_f64(_fp(v), v.size))


def host_compress(vol, scale, block=(32, 32, 32), use_local_rms=False,
                  num_threads=0, parity=False):
    """Full CPU compress through the native C ABI. Returns (container, ratio).

    Mirrors cvx_compress_th (reference C ABI, CvxCompress.hxx:169-182).
    `parity=True` uses the wavelet accumulation order of the reference's
    generated plain-AVX kernels, making the emitted coefficients (and thus
    the per-block payloads) bit-identical to the reference's -mavx build.
    """
    lib = _load()
    vol = np.ascontiguousarray(vol, dtype=F32)
    nz, ny, nx = vol.shape
    bx, by, bz = block
    cells = bx * by * bz
    nnn = (-(-nx // bx)) * (-(-ny // by)) * (-(-nz // bz))
    # worst case: every block raw (4*cells) + tables + header + slack
    cap = 32 + 12 * nnn + nnn * 4 * cells + 64
    out = np.zeros(cap, dtype=np.uint8)
    length = ctypes.c_long(0)
    if num_threads <= 0:
        num_threads = os.cpu_count() or 1
    fn = lib.cvx_compress_parity_th if parity else lib.cvx_compress_th
    ratio = fn(
        ctypes.c_float(float(scale)), _fp(vol), nx, ny, nz, bx, by, bz,
        ctypes.c_bool(bool(use_local_rms)), out.ctypes.data_as(_u32p),
        num_threads, ctypes.byref(length),
    )
    return out[: length.value].copy(), float(ratio)


def host_decompress(data, num_threads=0, parity=False):
    """Full CPU decompress through the native C ABI -> (nz, ny, nx) f32.

    `parity=True`: inverse wavelet in the reference's generated plain-AVX
    accumulation order — decompressed floats bit-identical to the
    reference's -mavx build for the same container.
    """
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    hdr = data[:12].view(np.uint32)
    nx, ny, nz = int(hdr[0]), int(hdr[1]), int(hdr[2])
    vol = np.empty((nz, ny, nx), dtype=F32)
    if num_threads <= 0:
        num_threads = os.cpu_count() or 1
    fn = (
        lib.cvx_decompress_inplace_parity_th
        if parity
        else lib.cvx_decompress_inplace_th
    )
    fn(
        _fp(vol), nx, ny, nz, data.ctypes.data_as(_u32p), num_threads,
        ctypes.c_long(data.size),
    )
    return vol


def wav_fwd_blocks(blocks):
    """In-place forward wavelet of (n, bz, by, bx) float32 blocks (native)."""
    lib = _load()
    n, bz, by, bx = blocks.shape
    lib.cvx_wav_fwd_blocks(_fp(blocks), n, bx, by, bz)


def wav_inv_blocks(blocks):
    lib = _load()
    n, bz, by, bx = blocks.shape
    lib.cvx_wav_inv_blocks(_fp(blocks), n, bx, by, bz)
