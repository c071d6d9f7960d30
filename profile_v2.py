"""Device throughput of the v2 codec pipeline, RTT-amortized (K-chained)."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from cvxcompress_tpu.ops import blocks as blkops
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


def rep(name, el, cells):
    dev = max((el - RTT) / K, 1e-9)
    print(f"{name}: {dev*1e3:.3f} ms/vol -> {cells/dev/1e9:.2f} GC/s")


def make_vol(shape, zero_frac, seed=0):
    r = np.random.default_rng(seed)
    v = r.standard_normal(shape).astype(np.float32) * 100
    v[r.random(shape) < zero_frac] = 0.0
    return v


for shape, block in (
    ((256, 256, 256), (128, 128, 128)),
    ((256, 256, 256), (32, 32, 32)),
):
    bx, by, bz = block
    cells = bx * by * bz
    chunk = rle_device.chunk_cells(cells)
    ncells = int(np.prod(shape))
    for name, vol in (
        ("sinusoid(hi-ratio)", None),
        ("90%zero", make_vol(shape, 0.98)),  # after quant ~more zeros
        ("50%zero", make_vol(shape, 0.5)),
    ):
        if vol is None:
            z = np.sin(np.arange(shape[0]) * np.pi * 10 / shape[0]).astype(np.float32)
            vol = np.broadcast_to(z[:, None, None], shape).copy()
        vd = jax.device_put(vol)
        mfv = jnp.float32(100.0)  # ~scale 1e-2 on unit-RMS data

        @functools.partial(jax.jit, static_argnames=())
        def pass1_loop(vd, mfv):
            def body(i, carry):
                v = vd + carry * 0.0
                b = blkops.to_blocks(v, block)
                coeffs = wavelet.forward_3d(b)
                n = coeffs.shape[0]
                mf = jnp.broadcast_to(mfv, (n,)).astype(jnp.float32)
                desc, cb, sizes, raw = rle_device.tokenize_desc(
                    coeffs.reshape(n, -1), mf, chunk
                )
                return (desc.sum() + cb.sum() + sizes.sum()).astype(jnp.float32) * 1e-20
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))

        el = timed(pass1_loop, vd, mfv)
        rep(f"{block[0]}^3 {name} pass1(wav+tok)", el, ncells)

        # real counts for caps
        b = blkops.to_blocks(vd, block)
        coeffs = jax.jit(wavelet.forward_3d)(b)
        n = coeffs.shape[0]
        c2d = coeffs.reshape(n, -1)
        mf = jnp.full((n,), 100.0, jnp.float32)
        desc, cb, sizes, raw = rle_device.tokenize_desc(c2d, mf, chunk)
        cb_h = np.asarray(cb)
        acap, lcap = rle_device.plan_capacities(cb_h)
        tot = int(np.asarray(sizes).sum())
        print(f"   acap={acap} lcap={lcap} bytes={tot} ratio={ncells*4/max(tot,1):.0f}")

        @functools.partial(jax.jit, static_argnames=())
        def pass2_loop(c2d, desc, cb, mf):
            def body(i, carry):
                sub = rle_device.pack_active(
                    c2d, desc, cb + (carry * 0).astype(jnp.int32), mf,
                    chunk, acap, lcap,
                )
                return sub.sum(dtype=jnp.int32).astype(jnp.float32) * 1e-20
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))

        el = timed(pass2_loop, c2d, desc, cb, mf)
        rep(f"{block[0]}^3 {name} pass2(pack)", el, ncells)

        # decompress device side: sparse expand + inverse
        from cvxcompress_tpu.ops import codec as jcodec

        pay, inv, pacap = jcodec.sparse_chunks(np.asarray(c2d), cells, chunk)
        payd, invd = jnp.asarray(pay), jnp.asarray(inv)

        @functools.partial(jax.jit, static_argnames=())
        def dec_loop(payd, invd):
            def body(i, carry):
                v = jcodec._decompress_sparse(
                    payd + carry * 0.0, invd, shape, block, chunk
                )
                return v.sum() * 1e-20
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))

        el = timed(dec_loop, payd, invd)
        rep(f"{block[0]}^3 {name} decompress(expand+inv)", el, ncells)
