"""Isolate pass1 (tokenize_desc) stage costs at both block shapes."""

import functools
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


def rep(name, el, cells):
    dev = max((el - RTT) / K, 1e-9)
    print(f"{name}: {dev*1e3:.3f} ms -> {cells/dev/1e9:.2f} GC/s")


def loop(body):
    @jax.jit
    def f(*arrays):
        def b(i, c):
            return body(c, *arrays).astype(jnp.float32) * 1e-20
        return jax.lax.fori_loop(0, K, b, jnp.float32(0))
    return f


r = np.random.default_rng(0)
total = 256 * 256 * 256
vals = (r.standard_normal(total) * 100).astype(np.float32)
vals[r.random(total) < 0.9] = 0

for n, c in ((8, 128**3), (512, 32**3)):
    x = jnp.asarray(vals.reshape(n, c))
    mf = jnp.full((n,), 1.0, jnp.float32)
    chunk = 512
    print(f"--- (N={n}, C={c})")

    el = timed(loop(lambda cc, x, mf: rle_device.tokenize_desc(
        x + cc * 0.0, mf, chunk)[2][0]), x, mf)
    rep("tokenize_desc", el, total)

    def quant_cls(cc, x, mf):
        _, iv = quant.quantize(x + cc * 0.0, mf[:, None])
        a, b2, c2, d = rle_device._classify(iv)
        return (a.sum() + b2.sum() + c2.sum() + d.sum()).astype(jnp.float32)

    el = timed(loop(quant_cls), x, mf)
    rep("quantize+classify", el, total)

    def groups(cc, x, mf):
        _, iv = quant.quantize(x + cc * 0.0, mf[:, None])
        m = rle_device._group_modes(*rle_device._classify(iv), (n, c))
        return m.sum().astype(jnp.float32)

    el = timed(loop(groups), x, mf)
    rep("+group_modes", el, total)

    def runs(cc, x, mf):
        _, iv = quant.quantize(x + cc * 0.0, mf[:, None])
        re_, rl = rle_device._run_structure(iv == 0, (n, c), chunk)
        return (re_.sum() + rl.sum()).astype(jnp.float32)

    el = timed(loop(runs), x, mf)
    rep("+run_structure", el, total)

    def cost_only(cc, x, mf):
        _, iv = quant.quantize(x + cc * 0.0, mf[:, None])
        izero, ib, isx, i3 = rle_device._classify(iv)
        m = rle_device._group_modes(izero, ib, isx, i3, (n, c))
        re_, rl = rle_device._run_structure(izero, (n, c), chunk)
        cost = rle_device._cost(m, izero, ib, isx, i3, re_, rl)
        return cost.sum().astype(jnp.float32)

    el = timed(loop(cost_only), x, mf)
    rep("+cost", el, total)
