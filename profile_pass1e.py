"""Fusion pathology hunt: full cost pipeline with selective barriers."""

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

n, rpb = 8, 64
mf = jnp.full((n,), 1.0, jnp.float32)


def full(c, x, mf, barrier=()):
    mfc = jnp.broadcast_to(mf[:, None], (n, rpb)).reshape(n * rpb, 1)
    _, iv = quant.quantize(x + c * 0.0, mfc)
    cls = rle_device._classify(iv)
    if "cls" in barrier:
        cls = jax.lax.optimization_barrier(cls)
    m = rle_device._group_modes(*cls, x.shape)
    if "m" in barrier:
        m = jax.lax.optimization_barrier(m)
    re_, rl = rle_device._run_structure(cls[0], n, rpb, 32768)
    if "run" in barrier:
        re_, rl = jax.lax.optimization_barrier((re_, rl))
    cost = rle_device._cost(m, *cls, re_, rl)
    return cost.sum(dtype=jnp.int32)


rep("full nobarrier", timed(loop(lambda c, x, mf: full(c, x, mf)), x, mf))
for b in (("run",), ("m",), ("cls",), ("cls", "m", "run")):
    rep(f"full barrier={b}", timed(
        loop(lambda c, x, mf, b=b: full(c, x, mf, b)), x, mf))

# variant: no group modes (mode=0)
def nogm(c, x, mf):
    mfc = jnp.broadcast_to(mf[:, None], (n, rpb)).reshape(n * rpb, 1)
    _, iv = quant.quantize(x + c * 0.0, mfc)
    cls = rle_device._classify(iv)
    m = jnp.zeros_like(iv)
    re_, rl = rle_device._run_structure(cls[0], n, rpb, 32768)
    cost = rle_device._cost(m, *cls, re_, rl)
    return cost.sum(dtype=jnp.int32)


rep("full mode=0", timed(loop(nogm), x, mf))


# variant: runs replaced by constants
def noruns(c, x, mf):
    mfc = jnp.broadcast_to(mf[:, None], (n, rpb)).reshape(n * rpb, 1)
    _, iv = quant.quantize(x + c * 0.0, mfc)
    cls = rle_device._classify(iv)
    m = rle_device._group_modes(*cls, x.shape)
    re_ = cls[0]
    rl = jnp.ones_like(iv)
    cost = rle_device._cost(m, *cls, re_, rl)
    return cost.sum(dtype=jnp.int32)


rep("full runs=const", timed(loop(noruns), x, mf))
