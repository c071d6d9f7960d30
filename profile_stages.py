"""Stage-by-stage profiling of the codec on the real TPU (device-resident)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from cvxcompress_tpu.ops import blocks as blk
from cvxcompress_tpu.ops import rle_device, wavelet


def t(fn, *a, iters=5):
    out = fn(*a)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    dev = jax.devices()[0]
    print("device:", dev)

    shape = (256, 256, 256)
    ncells = int(np.prod(shape))
    rng = np.random.default_rng(0)
    z = np.sin(np.arange(shape[0]) * np.pi * 10 / shape[0]).astype(np.float32)
    vol_h = np.broadcast_to(z[:, None, None], shape).copy()
    vol_h[:, ::7, ::11] += rng.standard_normal(
        (shape[0], -(-shape[1] // 7), -(-shape[2] // 11))
    ).astype(np.float32) * 1e-3

    # 1. transfer bandwidth
    el, vol = t(lambda v: jax.device_put(v, dev), vol_h, iters=3)
    print(f"h2d {vol_h.nbytes/1e6:.0f} MB: {el*1e3:.1f} ms = {vol_h.nbytes/el/1e6:.0f} MB/s")
    el, back = t(lambda v: np.asarray(v), vol, iters=3)
    print(f"d2h: {el*1e3:.1f} ms = {vol_h.nbytes/el/1e6:.0f} MB/s")

    for block in [(32, 32, 32), (128, 128, 128)]:
        print(f"--- block {block}")
        fwd = jax.jit(lambda v: wavelet.forward_3d(blk.to_blocks(v, block)))
        el, coeffs = t(fwd, vol)
        print(f"to_blocks+fwd: {el*1e3:.2f} ms = {ncells/el/1e6:.0f} MC/s")
        inv = jax.jit(wavelet.inverse_3d)
        el, _ = t(inv, coeffs)
        print(f"inverse:       {el*1e3:.2f} ms = {ncells/el/1e6:.0f} MC/s")

        n = coeffs.shape[0]
        cf = coeffs.reshape(n, -1)
        mf = jnp.full((n,), 123.4, jnp.float32)
        enc = jax.jit(rle_device.encode_blocks)
        el, (tok, off, sizes, raw) = t(enc, cf, mf)
        print(f"tokenize:      {el*1e3:.2f} ms = {ncells/el/1e6:.0f} MC/s")

        total = int(np.asarray(sizes).sum())
        cap = rle_device.bucket_cap(total)
        el, stream = t(lambda: rle_device.compact(tok, off, sizes, cap))
        print(f"compact(cap={cap}): {el*1e3:.2f} ms = {ncells/el/1e6:.0f} MC/s")
        el, _ = t(lambda: np.asarray(stream), iters=3)
        print(f"stream d2h {cap/1e6:.2f} MB: {el*1e3:.2f} ms")


if __name__ == "__main__":
    main()
