#!/usr/bin/env python
"""Round-5 roofline decomposition of the 128^3 whole-block compress kernel.

Variants at the north-star config (384^3, 128^3 blocks):
  full      — tokenize_desc_block (cascades + scale + tokenize, fv+desc out)
  casc_fv   — cascades + scale only, fv output only (no desc write, no
              tokenize VPU work): the floor any byte-dense-emission rework
              could reach while still materializing coefficients
  casc_min  — cascades + scale, (8,128)-probe output only (per-block): the
              pure-compute wall (input read + MXU dots, ~4 B/cell traffic)

Two-length differencing; one JSON line out.
"""
from __future__ import annotations

import functools
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from cvxcompress_tpu.ops import fused_compress as fc  # noqa: E402
from cvxcompress_tpu.ops import tokenize_pallas as tp  # noqa: E402
from cvxcompress_tpu.ops import wavelet  # noqa: E402
from cvxcompress_tpu.utils import volumes  # noqa: E402

B = 128


def fetch1(x):
    return np.asarray(jnp.ravel(x)[:1])


def per_iter(run, iters=4, reps=3):
    def loop(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            last = None
            for j in range(n):
                last = run(j)
            fetch1(last)
            best = min(best, time.perf_counter() - t0)
        return best

    for _ in range(3):
        t1, t2 = loop(iters), loop(2 * iters)
        if t2 > t1:
            return (t2 - t1) / iters
        iters *= 2
    return max(t2, 1e-9) / (2 * iters)


def _kernel_casc_fv(v_ref, opz_ref, opxt_ref, opy_ref, mf_ref, fv_ref, sA):
    opz, opxt, opy, mf = opz_ref[:], opxt_ref[:], opy_ref[:], mf_ref[:]
    for y in range(B):
        t = v_ref[:, y, :]
        t = tp.mxu_dot3(opz, t, False)
        sA[y, :, :] = tp.mxu_dot3(t, opxt, False)
    for z in range(B):
        t = tp.mxu_dot3(opy, sA[:, z, :], False)
        fv_ref[z * B : (z + 1) * B, :] = t * mf


def _kernel_casc_min(v_ref, opz_ref, opxt_ref, opy_ref, mf_ref, out_ref,
                     sA, sB):
    opz, opxt, opy, mf = opz_ref[:], opxt_ref[:], opy_ref[:], mf_ref[:]
    for y in range(B):
        t = v_ref[:, y, :]
        t = tp.mxu_dot3(opz, t, False)
        sA[y, :, :] = tp.mxu_dot3(t, opxt, False)
    acc = jnp.zeros((8, B), jnp.float32)
    for z in range(B):
        t = tp.mxu_dot3(opy, sA[:, z, :], False) * mf
        acc = acc + t[:8, :]  # consume everything; emit one tile
    out_ref[0, :, :] = acc


def run_variant(vol, vol_shape3, kind):
    nz, ny, nx = vol_shape3
    nbz, nby, nbx = nz // B, ny // B, nx // B
    nblocks = nbz * nby * nbx
    cpb = B * B * B // 128
    opz = wavelet._f32(wavelet.forward_matrix(B))
    opxt = wavelet._f32(wavelet.forward_matrix(B).T)
    opy = wavelet._f32(wavelet.forward_matrix(B))
    mf = jnp.reshape(jnp.float32(123.4), (1, 1))

    def in_map(b):
        return (b // (nby * nbx), (b // nbx) % nby, b % nbx)

    common = dict(
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((B, B, B), in_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )
    if kind == "casc_fv":
        f = pl.pallas_call(
            _kernel_casc_fv,
            out_specs=pl.BlockSpec((cpb, 128), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nblocks * cpb, 128),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, B, B), jnp.float32)],
            **common,
        )
    else:
        f = pl.pallas_call(
            _kernel_casc_min,
            out_specs=pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nblocks, 8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, B, B), jnp.float32),
                            pltpu.VMEM((8, B), jnp.float32)],
            **common,
        )
    return jax.jit(lambda v: f(v, opz, opxt, opy, mf))


def main():
    shape = (384, 384, 384)
    block = (B, B, B)
    vol = volumes.sinusoid_volume(*shape, periods=10)
    vd = [jax.device_put(vol), jax.device_put(vol * 1.0000001)]
    fetch1(vd[1])
    ncells = vol.size
    out = {"cells": ncells}

    def report(tag, t):
        out[tag] = {"ms": round(t * 1e3, 3),
                    "gcells_s": round(ncells / t / 1e9, 2)}
        print(f"{tag}: {t*1e3:.2f} ms = {ncells/t/1e9:.2f} GC/s",
              file=sys.stderr, flush=True)

    @jax.jit
    def full(v):
        r = fc.tokenize_desc_block(v, jnp.float32(123.4), shape, block)
        return r[0]

    fetch1(full(vd[0]))
    report("full", per_iter(lambda j: full(vd[j % 2])))

    g1 = run_variant(vol, shape, "casc_fv")
    fetch1(g1(vd[0]))
    report("casc_fv", per_iter(lambda j: g1(vd[j % 2])))

    g2 = run_variant(vol, shape, "casc_min")
    fetch1(g2(vd[0]))
    report("casc_min", per_iter(lambda j: g2(vd[j % 2])))

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
