"""A/B the decode scatter: dead-index handling + unique_indices.

Current: dead entries get idx=total (IN-bounds dummy slot of a
(total+1,) buffer) -> ~114k duplicate writes to one element at config A.
Variants route dead entries OUT of bounds (mode="drop" discards them)
and assert uniqueness of the live targets (true by construction: the
cursor is strictly increasing per emitted value within a block chain).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from cvxcompress_tpu.ops import codec as jcodec
from cvxcompress_tpu.ops import entropy_decode as ed
from cvxcompress_tpu.ops import wavelet
from cvxcompress_tpu.utils import volumes


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


def per_iter(run, iters=8, reps=3):
    t1 = loop_time(run, iters, reps)
    t2 = loop_time(run, 2 * iters, reps)
    return (t2 - t1) / iters


SHAPE = (352, 416, 320)
BLOCK = (32, 32, 32)
SCALE = 1e-2

vol = volumes.sinusoid_volume(*SHAPE)
data, ratio = jcodec.compress(vol, SCALE, block=BLOCK)
print(f"ratio {ratio:.0f}", flush=True)
p = ed.plan(data)
hdr = p["hdr"]
segs2 = [jax.device_put(p["segs"]), jax.device_put(p["segs"].copy())]
sblk = jnp.asarray(p["sub_block"])
sfst = jnp.asarray(p["sub_reset"])
ssf = jnp.asarray(p["scalefac"])
nseg = p["segs"].shape[0]
print(f"nseg={nseg}", flush=True)

bx, by, bz = BLOCK
nz, ny, nx = SHAPE
cells = bx * by * bz
nbz, nby, nbx = -(-nz // bz), -(-ny // by), -(-nx // bx)
nbx2 = wavelet.padded_nbx(nbx, bx)
nzp, nyp, nxp = nbz * bz, nby * by, nbx2 * bx
total = nzp * nyp * nxp


@functools.partial(jax.jit, static_argnames=("mode",))
def decode_variant(segs, mode):
    M, e32, c32, vals_s, sv, Bx = ed._parse_stages(segs, sfst, cells, True)
    val, idxp, _t = ed._emit_values_pallas(
        M, e32, c32, vals_s, sv, Bx, ssf, sblk, SHAPE, BLOCK
    )
    idx = idxp.reshape(-1)
    v = val.reshape(-1)
    out = jnp.zeros((total + 1,), jnp.float32)
    if mode == "cur":
        out = out.at[idx].set(v, mode="drop")
    elif mode == "oob":
        idx = idx + (idx == total)  # dead -> total+1, out of bounds
        out = out.at[idx].set(v, mode="drop")
    elif mode == "oob_unique":
        idx = idx + (idx == total)
        out = out.at[idx].set(v, mode="drop", unique_indices=True)
    elif mode == "cur_unique":
        out = out.at[idx].set(v, mode="drop", unique_indices=True)
    plane = out[:total].reshape(nzp * nyp, nxp)
    plane = wavelet.apply_x_inverse_rows(plane, bx)
    return wavelet.inverse_3d_volume(plane, SHAPE, BLOCK)


# reference output for bit-compare
ref = decode_variant(segs2[0], "cur")
refh = np.asarray(ref)

for mode in ("cur", "oob", "oob_unique", "cur_unique", "cur", "oob_unique"):
    out = decode_variant(segs2[0], mode)
    same = np.array_equal(np.asarray(out), refh)
    t = per_iter(lambda j, m=mode: decode_variant(segs2[j % 2], m))
    print(f"{mode:12s} {t*1e3:6.2f} ms  bit-identical={same}", flush=True)

# also time the baseline full fused program for context
def run_full(j):
    return jcodec._decode_and_inverse(
        segs2[j % 2], sblk, sfst, ssf, SHAPE, BLOCK, nseg, True
    )

fetch1(run_full(0))
print(f"full _decode_and_inverse: {per_iter(run_full)*1e3:6.2f} ms", flush=True)
