"""Split device-compress time into W / T / P at the bench configs."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from cvxcompress_tpu.ops import blocks as blkops
from cvxcompress_tpu.ops import codec as jcodec
from cvxcompress_tpu.ops import rle_device, wavelet
from bench import make_volume, measure_rtt, fetch1

RTT = measure_rtt()
print(f"RTT {RTT*1e3:.1f}")


def meas(label, fn, args_pairs, ncells, iters=6):
    fetch1(jax.tree.leaves(fn(*args_pairs[0]))[0])
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        last = None
        for j in range(iters):
            last = fn(*args_pairs[j % len(args_pairs)])
        fetch1(jax.tree.leaves(last)[0])
        best = min(best, time.perf_counter() - t0)
    per = max((best - RTT) / iters, 1e-9)
    print(f"{label}: {per*1e3:.2f} ms -> {ncells/per/1e9:.2f} GC/s")
    return per


for shape, block in (((352, 416, 320), (32, 32, 32)),
                     ((384, 384, 384), (128, 128, 128))):
    vol = make_volume(*shape)
    ncells = vol.size
    bx, by, bz = block
    cells = bx * by * bz
    chunk = rle_device.chunk_cells(cells)
    vd = [jax.device_put(vol), jax.device_put(vol * 1.0000001)]
    mf0 = jnp.float32(123.4)
    sc = jnp.float32(1e-2)
    print(f"--- {shape} {block}")

    # to_blocks alone (consume with cheap sum)
    tb = jax.jit(lambda v: blkops.to_blocks(v, block).sum())
    meas("to_blocks(sum)", tb, [(v,) for v in vd], ncells)

    W = lambda v: jcodec._stage_w(v, mf0, sc, False, block, chunk)
    meas("W stage", W, [(v,) for v in vd], ncells)

    rows, chunks, mf = W(vd[0])
    rows2, chunks2, _ = W(vd[1])
    T = lambda r: rle_device.tokenize_desc(r, mf, chunk)
    meas("T stage", T, [(rows,), (rows2,)], ncells)

    desc, cb, sizes, raw, counts = T(rows)
    acount, lcount = (int(x) for x in np.asarray(counts))
    acap, lcap = rle_device.bucket(acount), rle_device.bucket(lcount)
    print(f"   acount={acount} lcount={lcount}")
    P = lambda ch, d, c: rle_device.pack_active(ch, d, c, mf, acap, lcap)
    meas("P stage", P, [(chunks, desc, cb), (chunks2, desc, cb)], ncells)
