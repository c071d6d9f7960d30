"""True device throughput: amortize the ~30ms tunnel RTT over K in-jit iterations."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from cvxcompress_tpu.ops import rle_device, wavelet


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


RTT = None


def report(name, el, k, cells):
    dev = (el - RTT) / k
    print(f"{name}: {el*1e3:.1f} ms total, {dev*1e3:.3f} ms/iter -> {cells/dev/1e9:.2f} GC/s")


k0 = jax.random.PRNGKey(0)
tiny = jnp.zeros((8,), jnp.float32)
RTT = timed(jax.jit(lambda a: a + 1), tiny)
print(f"RTT: {RTT*1e3:.1f} ms")

K = 20
for bs, nblk in (((128, 128, 128), 32), ((32, 32, 32), 2048)):
    bz, by, bx = bs
    cells = nblk * bz * by * bx
    blocks = jax.random.normal(k0, (nblk, bz, by, bx), jnp.float32)
    print(f"--- {bs} x {nblk} ({cells*4/1e6:.0f} MB)")

    @functools.partial(jax.jit, static_argnames=())
    def loop_fwd(b):
        def body(i, b):
            c = wavelet.forward_3d(b)
            return c * (1.0 / (1.0 + i))  # data dep, keep magnitude sane
        return jax.lax.fori_loop(0, K, body, b)

    el = timed(loop_fwd, blocks)
    report("fwd_3d", el, K, cells)

    @jax.jit
    def loop_inv(b):
        def body(i, b):
            c = wavelet.inverse_3d(b)
            return c * (1.0 / (1.0 + i))
        return jax.lax.fori_loop(0, K, body, b)

    el = timed(loop_inv, blocks)
    report("inv_3d", el, K, cells)

    cf = blocks.reshape(nblk, -1)
    mf = jnp.full((nblk,), 123.4, jnp.float32)

    @jax.jit
    def loop_tok(cf, mf):
        def body(i, carry):
            tok, off, sizes, raw = rle_device.encode_blocks(cf + carry, mf)
            return carry + sizes.sum().astype(jnp.float32) * 1e-20
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    el = timed(loop_tok, cf, mf)
    report("tokenize", el, K, cells)

    tok, off, sizes, raw = jax.jit(rle_device.encode_blocks)(cf, mf)
    total = int(np.asarray(sizes).sum())
    cap = rle_device.bucket_cap(total)
    print(f"  stream total={total} cap={cap}")

    @functools.partial(jax.jit, static_argnames=("cap",))
    def loop_compact(tok, off, sizes, cap):
        def body(i, acc):
            s = rle_device.compact(tok, off, sizes + (acc % 1), cap)
            return acc + s[0].astype(jnp.int32)
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    el = timed(functools.partial(loop_compact, cap=cap), tok, off, sizes)
    report("compact", el, K, cells)
