"""Isolate wavelet vs tokenize costs; Q and block-size sensitivity."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from cvxcompress_tpu.ops import rle_device, wavelet

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
vals = (r.standard_normal(total) * 100).astype(np.float32)
vals[r.random(total) < 0.9] = 0

# wavelet alone per block size
for bs in (8, 16, 32, 64, 128):
    nblk = total // bs**3
    x = jnp.asarray(vals.reshape(nblk, bs, bs, bs))
    el = timed(loop(lambda c, x: wavelet.forward_3d(x + c * 0.0)[0, 0, 0, 0]), x)
    rep(f"wavelet fwd {bs}^3 x{nblk}", el)

# tokenize alone per (blocksize, Q)
for bs, q in ((32, 128), (32, 512), (128, 128), (128, 512), (128, 2048)):
    nblk = total // bs**3
    x = jnp.asarray(vals.reshape(nblk, bs**3))
    mf = jnp.full((nblk,), 1.0, jnp.float32)
    el = timed(loop(lambda c, x, mf, q=q: rle_device.tokenize_desc(
        x + c * 0.0, mf, q)[2][0]), x, mf)
    rep(f"tokenize bs={bs} Q={q}", el)
