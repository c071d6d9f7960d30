"""Split pack_active internals at the A-config working set."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from cvxcompress_tpu.ops import codec as jcodec
from cvxcompress_tpu.ops import pack, rle_device
from bench import make_volume, measure_rtt, fetch1

RTT = measure_rtt()
print(f"RTT {RTT*1e3:.1f}")

shape, block = (352, 416, 320), (32, 32, 32)
vol = make_volume(*shape)
ncells = vol.size
cells = 32**3
chunk = 128
vd = jax.device_put(vol)
chunks, desc, cb, sizes, raw, counts, mf = jcodec._encode_device(
    vd, jnp.float32(123.4), jnp.float32(1e-2), False, block, chunk
)
acount, lcount = (int(x) for x in np.asarray(counts))
acap, lcap = rle_device.bucket(acount), rle_device.bucket(lcount)
nchunks = chunks.shape[0]
print(f"nchunks={nchunks} acount={acount} acap={acap}")


def meas(label, fn, pairs, iters=6):
    fetch1(jax.tree.leaves(fn(*pairs[0]))[0])
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for j in range(iters):
            last = fn(*pairs[j % len(pairs)])
        fetch1(jax.tree.leaves(last)[0])
        best = min(best, time.perf_counter() - t0)
    per = max((best - RTT) / iters, 1e-9)
    print(f"{label}: {per*1e3:.2f} ms -> {ncells/per/1e9:.2f} GC/s")


cb2 = cb + 0  # variant for alternation
pairs = [(chunks, desc, cb), (chunks, desc, cb2)]

# full pack
P = lambda c, d, b: rle_device.pack_active(c, d, b, acap, lcap)[0]
meas("pack full", P, pairs)

# stage A: 1-D chunk-index compaction only
@functools.partial(jax.jit, static_argnames=())
def s_idx(c, d, b):
    live = b > 0
    cidx = jnp.arange(nchunks, dtype=jnp.int32)
    (aidx, abytes), count = pack.compact_live(
        (cidx, b), live, pack.ceil_log2(nchunks)
    )
    return aidx.sum(dtype=jnp.int32) + abytes.sum(dtype=jnp.int32) + count

meas("1d chunk-index compaction", s_idx, pairs)

# stage B: + gathers + plane rebuild + staging build (no logshift)
@functools.partial(jax.jit, static_argnames=())
def s_planes(c, d, b):
    live = b > 0
    cidx = jnp.arange(nchunks, dtype=jnp.int32)
    (aidx, abytes), count = pack.compact_live(
        (cidx, b), live, pack.ceil_log2(nchunks)
    )
    aidx = rle_device._fit(jnp.where(jnp.arange(nchunks) < count, aidx, 0), acap)
    fvg = jnp.take(c, aidx, axis=0)
    dsc = jnp.take(d, aidx, axis=0)
    from cvxcompress_tpu.ops import quant
    fv, iv = quant.quantize(fvg, jnp.float32(1.0))
    izero, ib, isx, i3 = rle_device._classify(iv)
    m = rle_device._group_modes(izero, ib, isx, i3, (acap, chunk))
    p0, p1, p2, p3_, p4, cost = rle_device._planes(
        fvg, iv, fv, dsc, m, izero, ib, isx, i3
    )
    staging = jnp.stack(
        [p.astype(jnp.uint8) for p in (p0, p1, p2, p3_, p4)], axis=-1
    ).reshape(acap, 5 * chunk)
    return staging.sum(dtype=jnp.int32) + cost.sum(dtype=jnp.int32)

meas("+gather+planes+staging", s_planes, pairs)
