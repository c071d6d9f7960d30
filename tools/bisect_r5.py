#!/usr/bin/env python
"""Round-5 same-session bisect: config-A compress stages + snapshot decode.

Times each stage of the 32^3 CI-config compress (stripe_fused_encode,
+seg pack, +bundle) and the snapshot reconstruct (now routed through the
fused inverse), with two-length differencing.  One JSON line out.

Usage: python tools/bisect_r5.py [--iters 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/cvx_jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fetch1(x):
    return np.asarray(jnp.ravel(x)[:1])


def loop_time(run, iters, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        last = None
        for j in range(iters):
            last = run(j)
        fetch1(last)
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter(run, iters, reps=3):
    for _ in range(3):
        t1 = loop_time(run, iters, reps)
        t2 = loop_time(run, 2 * iters, reps)
        if t2 > t1:
            return (t2 - t1) / iters
        iters *= 2
    return max(t2, 1e-9) / (2 * iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--shape", default="352,416,320")
    args = ap.parse_args()
    shape = tuple(int(v) for v in args.shape.split(","))
    block = (32, 32, 32)
    scale = 1e-2

    from cvxcompress_tpu.ops import codec as jcodec
    from cvxcompress_tpu.ops import rle_device, tokenize_pallas as tp
    from cvxcompress_tpu.utils import volumes

    vol = volumes.sinusoid_volume(*shape, periods=10)
    cells = 32768
    chunk = rle_device.chunk_cells(cells)
    ncells = vol.size
    vd = [jax.device_put(vol), jax.device_put(vol * 1.0000001)]
    fetch1(vd[1])
    mf0 = jnp.float32(123.4)
    out = {"shape": list(shape), "mcells": round(ncells / 1e6, 1)}

    def report(tag, t):
        out[tag] = {
            "ms": round(t * 1e3, 3),
            "mcells_s": round(ncells / t / 1e6),
        }
        log(f"{tag}: {t*1e3:.2f} ms = {ncells/t/1e6:.0f} MC/s")

    # stage 1: the fused W+T kernel alone (jit around the producer)
    @jax.jit
    def enc(v):
        return tp.stripe_fused_encode(v, mf0, shape, block, use_local=False)

    fetch1(enc(vd[0])[3])
    report("encode_wt", per_iter(lambda j: enc(vd[j % 2])[3], args.iters))

    # stage 2: encode + seg pack
    r = jcodec._encode_device(vd[0], mf0, jnp.float32(scale), False,
                              block, chunk)
    counts_h = np.asarray(r[5])
    gcfg0 = r[7]
    assert gcfg0 and gcfg0.get("seg"), "expected seg stripe path"
    caps = jcodec._derive_caps(counts_h, True)
    out["caps"] = [int(c) for c in caps]
    out["counts"] = [int(c) for c in counts_h]

    def enc_pack(v):
        ck, dsc, cb, sizes, raw, counts, mf, g = jcodec._encode_device(
            v, mf0, jnp.float32(scale), False, block, chunk
        )
        sub, lsid, lsb = rle_device.pack_active_stripe_seg(
            ck.reshape(-1, 128), dsc.reshape(-1, 128),
            g["cbrow"], g["raw_dev"], caps[0], caps[1], caps[2],
            g["plane_geom"],
        )
        return sub

    fetch1(enc_pack(vd[0]))
    report("encode_pack", per_iter(lambda j: enc_pack(vd[j % 2]),
                                   args.iters))

    # stage 3: full pipeline incl. bundle (what bench times)
    def full(v):
        ck, dsc, cb, sizes, raw, counts, mf, g = jcodec._encode_device(
            v, mf0, jnp.float32(scale), False, block, chunk
        )
        sub, lsid, lsb = rle_device.pack_active_stripe_seg(
            ck.reshape(-1, 128), dsc.reshape(-1, 128),
            g["cbrow"], g["raw_dev"], caps[0], caps[1], caps[2],
            g["plane_geom"],
        )
        return jcodec._bundle_outputs(sub, lsid, lsb, sizes, raw, counts, mf)

    fetch1(full(vd[0]))
    report("full_compress", per_iter(lambda j: full(vd[j % 2]), args.iters))

    # snapshot reconstruct (fused inverse path, round 5)
    from cvxcompress_tpu.snapshots import DeviceSnapshotStack

    store = DeviceSnapshotStack(shape, scale, block=block, max_pending=9)
    i0 = store.append(vd[0])
    store.flush()
    fetch1(store.get(i0))
    report("snapshot_get", per_iter(lambda j: store.get(i0), args.iters))

    # single-shot device decompress (for the same-session ratio)
    data, _ = jcodec.compress(vol, scale, block=block)
    from cvxcompress_tpu.ops import entropy_decode as ed

    p = ed.plan(data)
    segs = [jax.device_put(p["segs"]), jax.device_put(p["segs"].copy())]
    sblk = jnp.asarray(p["sub_block"])
    sfst = jnp.asarray(p["sub_reset"])
    ssf = jnp.asarray(p["scalefac"])
    nseg = p["segs"].shape[0]

    def dec(j):
        return jcodec._decode_and_inverse(
            segs[j % 2], sblk, sfst, ssf, shape, block, nseg, True
        )

    fetch1(dec(0))
    report("device_decompress", per_iter(dec, args.iters))

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
