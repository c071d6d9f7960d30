"""Benchmark: end-to-end codec throughput on real TPU hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MCells/s", "vs_baseline": N, ...}

Headline: harmonic-mean compress+decompress throughput on the reference's
end-to-end CI config (320x416x352 sinusoid, 32^3 blocks, scale 1e-2,
global RMS — Test_With_Generated_Input.cpp; reference publishes 2,150 MC/s
compress / 7,303 MC/s decompress on a multi-core AVX CPU, README.md:79,
harmonic mean 1,660 MC/s).  Details carry the per-phase numbers plus the
BASELINE.json north-star config (128^3 blocks).

Usage: python bench.py [--quick] [--json-only]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_ROUNDTRIP = 1660.0  # MC/s, harmonic mean of reference 2150/7303


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_volume(nz, ny, nx, periods=10):
    z = np.sin(np.arange(nz) * np.pi * periods / nz).astype(np.float32)
    vol = np.broadcast_to(z[:, None, None], (nz, ny, nx)).copy()
    # sprinkle mild structure so the entropy stage sees non-degenerate input
    r = np.random.default_rng(0)
    vol[:, ::7, ::11] += r.standard_normal((nz, -(-ny // 7), -(-nx // 11))).astype(
        np.float32
    ) * 1e-3
    return vol


def time_fn(fn, iters=3):
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_e2e(vol, block, scale=1e-2, iters=3):
    """End-to-end public-API compress/decompress (host container included)."""
    from cvxcompress_tpu.ops import codec as jcodec

    ncells = vol.size
    data, ratio = jcodec.compress(vol, scale, block=block)  # warmup + compile
    out = jcodec.decompress(data)  # warmup
    err = float(
        np.linalg.norm(out.astype(np.float64) - vol)
        / max(np.linalg.norm(vol.astype(np.float64)), 1e-30)
    )

    t_c = time_fn(lambda: jcodec.compress(vol, scale, block=block), iters)
    t_d = time_fn(lambda: jcodec.decompress(data), iters)
    return {
        "compress_mcells_s": ncells / t_c / 1e6,
        "decompress_mcells_s": ncells / t_d / 1e6,
        "roundtrip_mcells_s": ncells / (t_c + t_d) / 1e6,
        "ratio": float(ratio),
        "rel_error": err,
    }


def bench_device_stages(vol, block, scale=1e-2, iters=5):
    """Device-only stage throughput (wavelet fwd+inv, fwd+tokenize)."""
    import jax
    import jax.numpy as jnp

    from cvxcompress_tpu.ops import blocks as blkops
    from cvxcompress_tpu.ops import rle_device, wavelet

    ncells = vol.size
    blocks = jax.device_put(np.asarray(blkops.to_blocks_np(vol, block)))
    n = blocks.shape[0]

    fwd = jax.jit(wavelet.forward_3d)
    inv = jax.jit(wavelet.inverse_3d)
    coeffs = jax.block_until_ready(fwd(blocks))
    jax.block_until_ready(inv(coeffs))

    def roundtrip():
        jax.block_until_ready(inv(fwd(blocks)))

    t_w = time_fn(roundtrip, iters)

    mf = jnp.full((n,), 123.4, dtype=jnp.float32)
    flat = coeffs.reshape(n, -1)
    jax.block_until_ready(rle_device.encode_blocks(flat, mf))

    def tokenize():
        jax.block_until_ready(rle_device.encode_blocks(flat, mf))

    t_t = time_fn(tokenize, iters)
    return {
        "wavelet_fwd_inv_mcells_s": ncells / t_w / 1e6,
        "tokenize_mcells_s": ncells / t_t / 1e6,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small volume")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    if args.quick:
        vol1 = make_volume(96, 64, 64, periods=3)
        vol2 = make_volume(128, 128, 128)
    else:
        # reference CI config 1 (Test_With_Generated_Input itries=1)
        vol1 = make_volume(320, 416, 352)
        # BASELINE.json north star: 128^3-blocked volume
        vol2 = make_volume(384, 512, 384)

    log(f"e2e config A: {vol1.shape} 32^3 blocks")
    e2e32 = bench_e2e(vol1, (32, 32, 32), iters=args.iters)
    log(json.dumps(e2e32))

    log(f"e2e config B (north star): {vol2.shape} 128^3 blocks")
    e2e128 = bench_e2e(vol2, (128, 128, 128), iters=args.iters)
    log(json.dumps(e2e128))

    log("device stages at 128^3")
    dev128 = bench_device_stages(vol2, (128, 128, 128), iters=args.iters)
    log(json.dumps(dev128))

    value = e2e32["roundtrip_mcells_s"]
    print(
        json.dumps(
            {
                "metric": "e2e_roundtrip_320x416x352_32c_scale1e-2",
                "value": round(value, 1),
                "unit": "MCells/s",
                "vs_baseline": round(value / BASELINE_ROUNDTRIP, 3),
                "detail": {
                    "e2e_32cube": e2e32,
                    "e2e_128cube_north_star": e2e128,
                    "device_stages_128cube": dev128,
                    "baseline": {
                        "reference_compress_mcells_s": 2150,
                        "reference_decompress_mcells_s": 7303,
                        "reference_roundtrip_mcells_s": BASELINE_ROUNDTRIP,
                        "north_star_compress_gcells_s": 5,
                        "north_star_decompress_gcells_s": 8,
                    },
                },
            }
        )
    )


if __name__ == "__main__":
    main()
