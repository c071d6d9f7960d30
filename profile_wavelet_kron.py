"""Kron-fused (y,x) wavelet operator vs separable einsums at small blocks."""

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

shape = (352, 416, 320)
vol = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
ncells = vol.size
vd = [jax.device_put(vol), jax.device_put(vol * 1.0000001)]


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


for bs in (32, 16):
    block = (bs, bs, bs)
    Wb = np.asarray(wavelet.forward_matrix(bs))
    Wyx = jnp.asarray(np.kron(Wb, Wb), jnp.float32)  # (bs^2, bs^2)
    Wz = jnp.asarray(Wb, jnp.float32)

    def fwd_now(v):
        return wavelet.forward_3d(blkops.to_blocks(v, block))

    def fwd_kron(v):
        b = blkops.to_blocks(v, block)  # (N, bz, by, bx)
        n = b.shape[0]
        t = b.reshape(n * bs, bs * bs)
        t = jax.lax.dot(t, Wyx.T, precision=hi,
                        preferred_element_type=jnp.float32)
        b2 = t.reshape(n, bs, bs, bs)
        return jnp.einsum("...zyx,Zz->...Zyx", b2, Wz, precision=hi,
                          preferred_element_type=jnp.float32)

    jn, jk = jax.jit(fwd_now), jax.jit(fwd_kron)
    a0, a1 = np.asarray(jn(vd[0])), np.asarray(jk(vd[0]))
    rel = np.abs(a1 - a0).max() / np.abs(a0).max()
    print(f"bs={bs} kron rel diff {rel:.2e}")
    meas(f"bs={bs} fwd separable", jn, [(v,) for v in vd])
    meas(f"bs={bs} fwd kron(y,x)+z", jk, [(v,) for v in vd])
