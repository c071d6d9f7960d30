#!/usr/bin/env python
"""Write an all-zero raw float32 volume file (gen_empty_volume.cpp:10-46).

Usage: python tools/gen_empty_volume.py OUT.bin NX NY NZ
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cvxcompress_tpu.utils import volumes  # noqa: E402


def main():
    if len(sys.argv) != 5:
        print(__doc__)
        return 1
    path, nx, ny, nz = sys.argv[1], *map(int, sys.argv[2:5])
    volumes.write_raw(path, volumes.empty_volume(nz, ny, nx))
    print(f"wrote {path}: {nx} x {ny} x {nz} zeros ({4*nx*ny*nz} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
