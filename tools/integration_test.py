#!/usr/bin/env python
"""CI-gating integration test: round trips with asserted quality bars.

Equivalent of the reference's Test_With_Generated_Input
(Test_With_Generated_Input.cpp:19-126): three growing sinusoid volumes,
scale 1e-2, 32^3 blocks, asserting rel error < 2e-4 and SNR > 75 dB
(:121-122) plus a NaN scan of the input (:63-65).

Usage: python tools/integration_test.py [--full]
  default: k=1 size (320x416x352 cells ordered (nz,ny,nx)=(352,416,320))
  --full:  k=1..3 growing sizes like the reference
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--backend", default="jax")
    args = ap.parse_args()

    import cvxcompress_tpu as cvx
    from cvxcompress_tpu.utils import volumes

    ks = (1, 2, 3) if args.full else (1,)
    status = 0
    for k in ks:
        # reference dims: fast=320k, mid=416k, slow=352k
        nx, ny, nz = 320 * k, 416 * k, 352 * k
        vol = volumes.sinusoid_volume(nz, ny, nx)
        assert not np.isnan(vol).any(), "NaN in generated input"

        t0 = time.perf_counter()
        data, ratio = cvx.compress(vol, 1e-2, block=(32, 32, 32),
                                   backend=args.backend)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = cvx.decompress(data, backend=args.backend)
        td = time.perf_counter() - t0

        o = vol.astype(np.float64)
        d = o - out.astype(np.float64)
        err = float(np.sqrt((d * d).mean()) / np.sqrt((o * o).mean()))
        snr = -20 * np.log10(err) if err > 0 else float("inf")
        mc = vol.size / 1e6
        ok = err < 2e-4 and snr > 75.0
        print(f"[{nx}x{ny}x{nz}] ratio {ratio:.1f}:1  "
              f"compress {mc/tc:.0f} MC/s  decompress {mc/td:.0f} MC/s  "
              f"error {err:.3e}  SNR {snr:.1f} dB  "
              f"{'PASS' if ok else 'FAIL'}")
        if not ok:
            status = 1
    return status


if __name__ == "__main__":
    sys.exit(main())
