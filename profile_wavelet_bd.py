"""Block-diagonal K=128 wavelet contraction variants at small block sizes."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from cvxcompress_tpu.ops import blocks as blkops
from cvxcompress_tpu.ops import wavelet
from bench import measure_rtt, fetch1

RTT = measure_rtt()
print(f"RTT {RTT*1e3:.1f}")
hi = jax.lax.Precision.HIGHEST


def bd(mat, copies):
    d = mat.shape[0]
    out = np.zeros((d * copies, d * copies), np.float64)
    for i in range(copies):
        out[i * d : (i + 1) * d, i * d : (i + 1) * d] = mat
    return jnp.asarray(out, jnp.float32)


def meas(label, fn, pairs, ncells, iters=6):
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


shape = (352, 416, 320)
vol = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
ncells = vol.size
vd = [jax.device_put(vol), jax.device_put(vol * 1.0000001)]

for bs in (32, 16, 8):
    block = (bs, bs, bs)
    g = 128 // bs
    Wb = jnp.asarray(wavelet.forward_matrix(bs), jnp.float32)
    BD = bd(wavelet.forward_matrix(bs), g)
    # 2-axis operators: T[G*Y, g*y] = delta * W  == BD reshaped
    T4 = BD.reshape(g, bs, g, bs)

    def fwd_now(v):
        return wavelet.forward_3d(blkops.to_blocks(v, block))

    def fwd_bdx(v):
        b = blkops.to_blocks(v, block)  # (N, bz, by, bx)
        n = b.shape[0]
        # x: merged flat 128-wide rows
        t = b.reshape(-1, 128)
        t = jax.lax.dot(t, BD.T, precision=hi,
                        preferred_element_type=jnp.float32)
        b = t.reshape(n, bs, bs, bs)
        # y, z: plain einsums
        b = jnp.einsum("...zyx,Yy->...zYx", b, Wb, precision=hi,
                       preferred_element_type=jnp.float32)
        b = jnp.einsum("...zyx,Zz->...Zyx", b, Wb, precision=hi,
                       preferred_element_type=jnp.float32)
        return b

    def fwd_bd_all(v):
        b = blkops.to_blocks(v, block)
        n = b.shape[0]
        t = b.reshape(-1, 128)
        t = jax.lax.dot(t, BD.T, precision=hi,
                        preferred_element_type=jnp.float32)
        # y: contract (g z-slices, y) jointly with I_g (x) W_y
        a = t.reshape(n * bs // g, g, bs, bs)  # (B, g_z, y, x)
        a = jnp.einsum("bgyx,GYgy->bGYx", a, T4, precision=hi,
                       preferred_element_type=jnp.float32)
        # z: contract (g blocks, z) jointly (pad block count to g)
        npad = -(-n // g) * g
        a = a.reshape(n, bs, bs, bs)
        if npad != n:
            a = jnp.concatenate(
                [a, jnp.zeros((npad - n, bs, bs, bs), jnp.float32)], axis=0
            )
        c = a.reshape(npad // g, g, bs, bs, bs)
        c = jnp.einsum("bgzyx,GZgz->bGZyx", c, T4, precision=hi,
                       preferred_element_type=jnp.float32)
        return c.reshape(npad, bs, bs, bs)[:n]

    jnow = jax.jit(fwd_now)
    jbdx = jax.jit(fwd_bdx)
    jall = jax.jit(fwd_bd_all)

    # correctness
    a0 = np.asarray(jnow(vd[0]))
    for nm, f in (("bdx", jbdx), ("bd_all", jall)):
        a1 = np.asarray(f(vd[0]))
        rel = np.abs(a1 - a0).max() / (np.abs(a0).max() + 1e-9)
        print(f"bs={bs} {nm} max rel diff vs now: {rel:.2e}")

    meas(f"bs={bs} fwd now", jnow, [(v,) for v in vd], ncells)
    meas(f"bs={bs} fwd bd-x", jbdx, [(v,) for v in vd], ncells)
    meas(f"bs={bs} fwd bd-all", jall, [(v,) for v in vd], ncells)
