"""Bit-parity validation of the oracle against the actual reference binary.

Compiles the reference's scalar slow-path transform
(/root/reference/Wavelet_Transform_Slow.cpp — self-contained, no SIMD deps)
into a throwaway shared object and compares our NumPy oracle against it
bit-for-bit.  Skipped when the reference tree or a compiler is unavailable.

-ffp-contract=off pins IEEE per-operation semantics (no FMA contraction), the
same arithmetic our float32 NumPy oracle performs.
"""

import ctypes
import os
import subprocess
import tempfile

import numpy as np
import pytest

from cvxcompress_tpu.oracle import wavelet

REF_SRC = "/root/reference/Wavelet_Transform_Slow.cpp"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_SRC), reason="reference tree not available"
)


@pytest.fixture(scope="module")
def ref_lib():
    from conftest import file_lock

    so_path = os.path.join(tempfile.gettempdir(), "ref_slow_wavelet.so")
    with file_lock("ref_slow_wavelet"):  # xdist workers share /tmp
        if not os.path.exists(so_path):
            res = subprocess.run(
                [
                    "g++", "-O2", "-fopenmp", "-fPIC", "-shared",
                    "-ffp-contract=off", REF_SRC, "-o", so_path + ".tmp",
                ],
                capture_output=True,
            )
            if res.returncode != 0:
                pytest.skip(
                    f"reference build failed: {res.stderr.decode()[:200]}"
                )
            os.replace(so_path + ".tmp", so_path)
    lib = ctypes.CDLL(so_path)
    # resolve the C++-mangled symbol names
    syms = subprocess.run(["nm", "-D", so_path], capture_output=True, text=True)
    fwd = inv = None
    for line in syms.stdout.splitlines():
        if "Wavelet_Transform_Slow_Forward" in line:
            fwd = line.split()[-1]
        elif "Wavelet_Transform_Slow_Inverse" in line:
            inv = line.split()[-1]
    if fwd is None or inv is None:
        pytest.skip("symbols not found")
    f32p = ctypes.POINTER(ctypes.c_float)
    args = [f32p, f32p] + [ctypes.c_int] * 9
    ffwd = getattr(lib, fwd)
    ffwd.argtypes = args
    finv = getattr(lib, inv)
    finv.argtypes = args
    return ffwd, finv


def _call(ref_fn, block):
    bz, by, bx = block.shape
    data = np.ascontiguousarray(block, dtype=np.float32).copy()
    work = np.zeros(max(bx, by, bz) + 8, dtype=np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    ref_fn(
        data.ctypes.data_as(f32p), work.ctypes.data_as(f32p),
        bx, by, bz, 0, 0, 0, bx, by, bz,
    )
    return data


@pytest.mark.parametrize(
    "shape", [(8, 8, 8), (16, 8, 32), (32, 32, 32), (1, 16, 16), (4, 4, 4)]
)
def test_forward_bit_exact(ref_lib, shape, rng):
    ffwd, _ = ref_lib
    x = rng.standard_normal(shape).astype(np.float32)
    ref = _call(ffwd, x)
    ours = wavelet.forward_3d(x)
    np.testing.assert_array_equal(
        ref.view(np.uint32), ours.view(np.uint32),
        err_msg="forward transform differs from reference slow path bitwise",
    )


@pytest.mark.parametrize("shape", [(8, 8, 8), (16, 8, 32), (32, 32, 32)])
def test_inverse_bit_exact(ref_lib, shape, rng):
    ffwd, finv = ref_lib
    x = rng.standard_normal(shape).astype(np.float32)
    coeffs = _call(ffwd, x)
    ref = _call(finv, coeffs)
    ours = wavelet.inverse_3d(coeffs)
    np.testing.assert_array_equal(ref.view(np.uint32), ours.view(np.uint32))
