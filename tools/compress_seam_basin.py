#!/usr/bin/env python
"""Scale-sweep benchmark writing a results CSV (Compress_SEAM_Basin analog).

The reference CLI (Compress_SEAM_Basin.cpp:22-173) loops a SEAM Basin
velocity volume over quantization scales and appends
(scale, ratio, error, snr, throughputs) rows to results.txt.  This tool
does the same over a raw-file or synthetic volume.

Usage:
  python tools/compress_seam_basin.py [--file vol.bin --nz .. --ny .. --nx ..]
         [--scales 1e-1,3e-2,1e-2,3e-3,1e-3] [--block 32,32,32]
         [--results results.txt]
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
    ap.add_argument("--file")
    ap.add_argument("--nz", type=int, default=128)
    ap.add_argument("--ny", type=int, default=192)
    ap.add_argument("--nx", type=int, default=192)
    ap.add_argument("--scales", default="1e-1,3e-2,1e-2,3e-3,1e-3")
    ap.add_argument("--block", default="32,32,32")
    ap.add_argument("--backend", default="jax")
    ap.add_argument("--results", default="results.txt")
    args = ap.parse_args()

    import cvxcompress_tpu as cvx
    from cvxcompress_tpu.utils import volumes

    if args.file:
        vol = volumes.read_raw(args.file, args.nz, args.ny, args.nx)
    else:
        vol = volumes.radial_volume(args.nz, args.ny, args.nx)
    block = tuple(int(v) for v in args.block.split(","))
    scales = [float(s) for s in args.scales.split(",")]

    write_header = not os.path.exists(args.results)
    with open(args.results, "a") as f:
        if write_header:
            f.write("scale,ratio,rel_error,snr_db,compress_mcs,decompress_mcs\n")
        for scale in scales:
            t0 = time.perf_counter()
            data, ratio = cvx.compress(vol, scale, block=block,
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
            row = (f"{scale:g},{ratio:.3f},{err:.4e},{snr:.2f},"
                   f"{mc/tc:.1f},{mc/td:.1f}")
            print(row)
            f.write(row + "\n")
    print(f"appended {len(scales)} rows to {args.results}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
