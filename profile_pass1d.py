"""Find the slow helper inside tokenize at bs=128 (n=8, rpb=64)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from cvxcompress_tpu.ops import quant, rle_device

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
x_h = (r.standard_normal((512, 32768)) * 100).astype(np.float32)
x_h[r.random(x_h.shape) < 0.9] = 0
x = jnp.asarray(x_h)

for n, rpb in ((512, 1), (8, 64)):
    mf = jnp.full((n,), 1.0, jnp.float32)
    print(f"--- n={n} rpb={rpb}")

    def qc(c, x, mf):
        mfc = jnp.broadcast_to(mf[:, None], (n, rpb)).reshape(n * rpb, 1)
        _, iv = quant.quantize(x + c * 0.0, mfc)
        a, b2, c2, d = rle_device._classify(iv)
        return (a.sum(dtype=jnp.int32) + b2.sum(dtype=jnp.int32)
                + c2.sum(dtype=jnp.int32) + d.sum(dtype=jnp.int32))

    rep("quant+classify", timed(loop(qc), x, mf))

    def gm(c, x, mf):
        mfc = jnp.broadcast_to(mf[:, None], (n, rpb)).reshape(n * rpb, 1)
        _, iv = quant.quantize(x + c * 0.0, mfc)
        m = rle_device._group_modes(*rle_device._classify(iv), x.shape)
        return m.sum(dtype=jnp.int32)

    rep("+group_modes", timed(loop(gm), x, mf))

    def rs(c, x, mf):
        mfc = jnp.broadcast_to(mf[:, None], (n, rpb)).reshape(n * rpb, 1)
        _, iv = quant.quantize(x + c * 0.0, mfc)
        re_, rl = rle_device._run_structure(iv == 0, n, rpb, 32768)
        return re_.sum(dtype=jnp.int32) + rl.sum(dtype=jnp.int32)

    rep("+run_structure", timed(loop(rs), x, mf))

    def rs_nolen(c, x, mf):
        mfc = jnp.broadcast_to(mf[:, None], (n, rpb)).reshape(n * rpb, 1)
        _, iv = quant.quantize(x + c * 0.0, mfc)
        re_, rl = rle_device._run_structure(iv == 0, n, rpb, 32768)
        return re_.sum(dtype=jnp.int32)

    rep("+run_structure(end only)", timed(loop(rs_nolen), x, mf))
