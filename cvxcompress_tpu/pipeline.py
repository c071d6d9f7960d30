"""Streaming / pipelined codec driver for snapshot sequences.

The production shape of this codec is RTM wavefield snapshot streams: one
volume per timestep, compressed on the fly (forward pass) and decompressed
in reverse order (backward pass).  The reference overlaps work with OpenMP
threads inside one volume; on TPU the right overlap is ACROSS volumes:

  * device work is dispatched asynchronously (jax dispatch returns in
    ~0.2-1 ms; the chip serializes execution),
  * the per-volume host work — capacity-count readback, compressed-bytes
    readback, container assembly — runs on a thread pool so the readback
    round trips of volume k overlap the device compute of volumes k+1..k+w.

`compress_stream` / `decompress_stream` preserve input order.  Throughput
scales until either the chip (device time per volume) or the host link
saturates; workers=4-8 is enough to hide several RTTs of latency.
"""

from __future__ import annotations

import concurrent.futures as _cf

from .ops import codec as _codec


def compress_stream(volumes, scale, block=(32, 32, 32), use_local_rms=False,
                    workers=6):
    """Compress an iterable of same-shape volumes, pipelined; yields
    (container, ratio) in input order."""
    with _cf.ThreadPoolExecutor(workers) as ex:
        futs = [
            ex.submit(_codec.compress, v, scale, block, use_local_rms)
            for v in volumes
        ]
        for f in futs:
            yield f.result()


def decompress_stream(containers, workers=6):
    """Decompress an iterable of containers, pipelined; yields volumes in
    input order."""
    with _cf.ThreadPoolExecutor(workers) as ex:
        futs = [ex.submit(_codec.decompress, d) for d in containers]
        for f in futs:
            yield f.result()
