"""Bisect pass1 at 128^3 with DCE-proof (sum-consumed) timing."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from cvxcompress_tpu.ops import blocks as blkops
from cvxcompress_tpu.ops import quant, rle_device, wavelet

K = 10


def timed(fn, *a, iters=3):
    out = fn(*a)
    _ = np.asarray(jnp.ravel(jax.tree.leaves(out)[0])[:1])
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*a)
        _ = np.asarray(jnp.ravel(jax.tree.leaves(out)[0])[:1])
        best = min(best, time.perf_counter() - t0)
    return best


RTT = timed(jax.jit(lambda a: a + 1), jnp.zeros((8,), jnp.float32))
print(f"RTT {RTT*1e3:.1f} ms")
total = 256**3


def rep(name, el):
    dev = max((el - RTT) / K, 1e-9)
    print(f"{name}: {dev*1e3:.3f} ms -> {total/dev/1e9:.2f} GC/s")


def loop(body):
    @jax.jit
    def f(*arrays):
        def b(i, c):
            return body(c, *arrays).astype(jnp.float32) * 1e-20
        return jax.lax.fori_loop(0, K, b, jnp.float32(0))
    return f


r = np.random.default_rng(0)
vol = (r.standard_normal((256, 256, 256)) * 100).astype(np.float32)
vol[r.random(vol.shape) < 0.9] = 0
vd = jax.device_put(vol)

for bs in (32, 128):
    block = (bs, bs, bs)
    n = total // bs**3
    chunk = 128

    el = timed(loop(lambda c, vd: blkops.to_blocks(vd + c * 0.0, block).sum()), vd)
    rep(f"{bs}^3 to_blocks", el)

    el = timed(loop(lambda c, vd: wavelet.forward_3d(
        blkops.to_blocks(vd + c * 0.0, block)).sum()), vd)
    rep(f"{bs}^3 to_blocks+fwd", el)

    coeffs = jax.jit(wavelet.forward_3d)(blkops.to_blocks(vd, block))
    c2d = coeffs.reshape(n, -1)
    mf = jnp.full((n,), 1.0, jnp.float32)

    el = timed(loop(lambda c, x, mf: sum(
        o.sum(dtype=jnp.int32) for o in rle_device.tokenize_desc(
            x + c * 0.0, mf, chunk)[:3])), c2d, mf)
    rep(f"{bs}^3 tokenize_full", el)

    # tokenize without the final (nchunks,128) desc reshape: stop at cost
    def tok_nodesc(c, x, mf):
        nn, cc = x.shape
        row = rle_device.row_cells(cc)
        rpb = cc // row
        xr = x.reshape(nn * rpb, row) + c * 0.0
        mfc = jnp.broadcast_to(mf[:, None], (nn, rpb)).reshape(nn * rpb, 1)
        _, iv = quant.quantize(xr, mfc)
        izero, ib, isx, i3 = rle_device._classify(iv)
        m = rle_device._group_modes(izero, ib, isx, i3, xr.shape)
        re_, rl = rle_device._run_structure(izero, nn, rpb, row)
        cost = rle_device._cost(m, izero, ib, isx, i3, re_, rl)
        return cost.sum(dtype=jnp.int32)

    el = timed(loop(tok_nodesc), c2d, mf)
    rep(f"{bs}^3 tokenize_cost_only", el)
