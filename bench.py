"""Benchmark: codec throughput on real TPU hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MCells/s", "vs_baseline": N, ...}

Headline: harmonic-mean compress+decompress DEVICE-PIPELINE throughput on
the reference's end-to-end CI config (320x416x352 sinusoid — the exact
Test_With_Generated_Input.cpp input, quality bars asserted in-bench —
32^3 blocks, scale 1e-2, global RMS; the reference publishes
2,150 / 7,303 MC/s on a multi-core AVX CPU, README.md:79, harmonic mean
1,660 MC/s).

"Device pipeline" = everything the chip does per volume: block layout,
forward wavelet, tokenize, active-chunk packing (compress); entropy
parse (ops.entropy_decode), scatter-expand, and inverse wavelet
(decompress — the parse is ON DEVICE, nothing of the entropy stage is
host-side).  Measured by dispatching K volumes and fetching once —
through this environment's tunneled TPU, per-call dispatch+fetch costs
~30 ms RTT and d2h of computed buffers runs at ~30 MB/s, which are
properties of the tunnel, not the framework or the chip (PERF_NOTES.md).
The recurring HOST work per volume (container assembly on compress,
segment planning on decompress) is measured separately and reported in
`detail` (host_assembly_ms / host_plan_ms).  The sustained stage streams
volumes through the BATCHED stream APIs (pipeline.compress_batched /
decompress_batched) with all host work charged.

Evidence discipline (round-4 fix for the round-3 rc=124 timeout):
  * a WALL-CLOCK BUDGET (--budget, default 300 s) gates every stage;
    stages that would not fit are skipped and listed in detail.skipped
  * partial results flush to BENCH_partial.json after every stage, so a
    kill at any point still leaves a parseable record
  * the final JSON line ALWAYS prints — even if a stage raised — with
    whatever was measured (detail.error carries the failure)

Usage: python bench.py [--quick] [--budget SECONDS] [--full]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# honor an explicit JAX_PLATFORMS=cpu (smoke runs / CI): the ambient TPU
# plugin overrides the env var through this environment's tunnel
# (CLAUDE.md), but jax.config is respected if set before device init
if os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# persistent compile cache: the codec programs are large and remote-compile
# through the tunnel (~20-40 s each); with the cache warm the run spends
# its time measuring, not compiling
import jax as _jax2  # noqa: E402

_jax2.config.update("jax_compilation_cache_dir", "/tmp/cvx_jax_bench_cache")
_jax2.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_ROUNDTRIP = 1660.0  # MC/s, harmonic mean of reference 2150/7303
BASELINE_COMPRESS = 2150.0
BASELINE_DECOMPRESS = 7303.0

PARTIAL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_partial.json")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class Budget:
    """Wall-clock budget: stages check in before starting."""

    def __init__(self, total_s):
        self.t0 = time.monotonic()
        self.total = total_s
        self.skipped = []

    def elapsed(self):
        return time.monotonic() - self.t0

    def left(self):
        return self.total - self.elapsed()

    def admit(self, name, need_s):
        """True if `name` fits in the remaining budget, else record skip."""
        if self.left() >= need_s:
            return True
        self.skipped.append(name)
        log(f"[budget] skip {name}: need ~{need_s:.0f}s, "
            f"{self.left():.0f}s left")
        return False


def flush_partial(detail):
    """Write the partial record after every stage (kill-safe evidence)."""
    try:
        with open(PARTIAL_PATH, "w") as f:
            json.dump(detail, f)
    except OSError:
        pass


def make_volume(nz, ny, nx, periods=10):
    """The reference CI input: pure sinusoid x-slices, NO added noise
    (Test_With_Generated_Input.cpp:45-51) — quality and vs_baseline are
    measured on the same data the published baselines used."""
    from cvxcompress_tpu.utils import volumes

    return volumes.sinusoid_volume(nz, ny, nx, periods=periods)


def fetch1(x):
    import jax.numpy as jnp

    return np.asarray(jnp.ravel(x)[:1])


def measure_rtt():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda a: a + 1)
    z = jnp.zeros((8,), jnp.float32)
    fetch1(f(z))
    fetch1(f(z))
    best = float("inf")
    for _ in range(9):
        t0 = time.perf_counter()
        fetch1(f(z))
        best = min(best, time.perf_counter() - t0)
    return best


def loop_time(run, iters, reps=2):
    """Best wall time of `iters` chained dispatches + ONE fetch."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        last = None
        for j in range(iters):
            last = run(j)
        fetch1(last)
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter_time(run, iters, reps=2):
    """Per-iteration time by TWO-LENGTH DIFFERENCING: t = (T(2k)-T(k))/k.

    Subtracting a separately measured RTT is fragile — the tunnel RTT
    jitters by several ms, and when iters*t is smaller than that jitter
    the difference goes negative (the round-3 block sweep recorded
    16,777,216,000 MC/s "decompress" from exactly this).  Differencing
    two loop lengths cancels the constant dispatch+fetch offset exactly.
    """
    for _ in range(3):
        t1 = loop_time(run, iters, reps)
        t2 = loop_time(run, 2 * iters, reps)
        if t2 > t1:
            return (t2 - t1) / iters
        iters *= 2  # noise swamped the diff: double until it can't
    return max(t2, 1e-9) / (2 * iters)  # upper bound, never nonsense


def bench_device_compress(vol, block, scale, iters=6, reps=3,
                          use_local=False):
    """Per-volume device time of the full compress pipeline (W+T+P jits)."""
    import jax
    import jax.numpy as jnp

    from cvxcompress_tpu.ops import codec as jcodec
    from cvxcompress_tpu.ops import rle_device

    from cvxcompress_tpu.ops import pack_pallas
    from cvxcompress_tpu.ops import tokenize_pallas as tp

    bx, by, bz = block
    cells = bx * by * bz
    chunk = rle_device.chunk_cells(cells)
    # ONE h2d; the second buffer is a device-side multiply (the tunnel
    # uploads at ~50 MB/s — every avoided volume upload saves seconds)
    v0 = jax.device_put(vol)
    vd = [v0, v0 * jnp.float32(1.0000001)]
    mf0 = jnp.float32(123.4)
    nnn = -(-vol.shape[0] // bz) * -(-vol.shape[1] // by) * -(-vol.shape[2] // bx)
    nchunks = nnn * (cells // chunk)
    fused = (
        jcodec._fused_compact_enabled()
        and jcodec.use_pallas() and chunk == tp.LANES and nchunks >= 2 * tp.TR
    )

    if fused:
        def stage1(v):
            fvp, mf = jcodec._stage_w_pallas(
                v, mf0, jnp.float32(scale), use_local, block, chunk
            )
            return tp.tokenize_compact_fast(fvp, nnn, cells // chunk, chunk)

        cb, sizes, raw, counts, fvc, dscc, meta = stage1(vd[0])
        acount, lcount = (int(x) for x in np.asarray(counts))
        acap = max(pack_pallas.GR, rle_device.bucket(acount))
        lcap = rle_device.bucket(lcount)

        def full(v):
            cb, sizes, raw, counts, fvc, dscc, meta = stage1(v)
            sub, aidx, ab = rle_device.pack_compacted(
                fvc, dscc, meta, counts[0], acap, lcap
            )
            return sub
    else:
        def run(v):
            (chunks, desc, cb, sizes, raw, counts, mf,
             gcfg) = jcodec._encode_device(
                v, mf0, jnp.float32(scale), use_local, block, chunk
            )
            return chunks, desc, cb, mf, counts, gcfg

        out = run(vd[0])
        counts_h = np.asarray(out[4])
        gcfg0 = out[5]
        acount, lcount = int(counts_h[0]), int(counts_h[1])
        if gcfg0 and gcfg0.get("seg"):
            # stripe SEGMENT pack (codec.compress's seg branch)
            caps = jcodec._derive_caps(counts_h, True)

            def full(v):
                chunks, desc, cb, mf, counts, g = run(v)
                sub, lsid, lsb = rle_device.pack_active_stripe_seg(
                    chunks.reshape(-1, 128), desc.reshape(-1, 128),
                    g["cbrow"], g["raw_dev"], caps[0], caps[1], caps[2],
                    g["plane_geom"],
                )
                return sub
        else:
            acap, lcap = rle_device.bucket(acount), rle_device.bucket(lcount)
            skip = acount == lcount

            def full(v):
                chunks, desc, cb, mf, counts, gcfg = run(v)
                pgeom = gcfg.get("plane_geom") if gcfg else None
                sub, aidx, ab = rle_device.pack_active(
                    chunks, desc, cb, acap, lcap, skip_squeeze=skip,
                    row_of_chunk=(
                        None if pgeom
                        else (gcfg["row_of_chunk"] if gcfg else None)
                    ),
                    desc_row_of_chunk=(
                        gcfg["desc_row_of_chunk"] if gcfg and not pgeom
                        else None
                    ),
                    nchunks_override=gcfg["nchunks"] if gcfg else None,
                    plane_geom=pgeom,
                )
                return sub

    fetch1(full(vd[0]))  # compile
    # reps=3: the tunnel drifts between seconds; best-of picks the
    # clean moments (PERF_NOTES #22)
    return per_iter_time(lambda j: full(vd[j % 2]), iters, reps=reps)


def bench_device_decompress(data, vol_shape, iters=6, reps=3):
    """Per-volume device time of the FULL decompress pipeline.

    Entropy parse (ops.entropy_decode) + scatter-expand + inverse wavelet,
    all on device — nothing of the entropy stage runs on host.  Also
    returns the host-side segment-planning time per volume.
    """
    import jax
    import jax.numpy as jnp

    from cvxcompress_tpu.ops import codec as jcodec
    from cvxcompress_tpu.ops import entropy_decode as ed

    t0 = time.perf_counter()
    p = ed.plan(data)
    t_plan = time.perf_counter() - t0
    assert p is not None and not p["raw_ids"].size
    hdr = p["hdr"]
    block = (hdr.bx, hdr.by, hdr.bz)
    segs = [jax.device_put(p["segs"]), jax.device_put(p["segs"].copy())]
    sblk = jnp.asarray(p["sub_block"])
    sfst = jnp.asarray(p["sub_reset"])
    ssf = jnp.asarray(p["scalefac"])
    nseg = p["segs"].shape[0]

    on_tpu = jcodec.use_pallas()

    def run(s):
        return jcodec._decode_and_inverse(
            s, sblk, sfst, ssf, vol_shape, block, nseg, on_tpu
        )

    fetch1(run(segs[0]))
    return per_iter_time(lambda j: run(segs[j % 2]), iters, reps=reps), t_plan


def bench_host_stream(vol, block, scale, n_vols=2, workers=6):
    """Pipelined host->container throughput (includes tunnel transfers).

    NOT in the default stage list: through this environment's tunnel the
    h2d of raw volumes dominates (~80 s/vol recorded in BENCH_r03) — it
    measures the tunnel, not the codec.  Opt-in via --full.
    """
    from cvxcompress_tpu import pipeline

    vols = [vol * (1.0 + 1e-6 * j) for j in range(n_vols)]
    next(pipeline.compress_stream([vol], scale, block, workers=1))
    t0 = time.perf_counter()
    res = list(pipeline.compress_stream(vols, scale, block, workers=workers))
    el = time.perf_counter() - t0
    return el / n_vols, res[0]


def bench_sustained(vol, block, scale, n_vols=8, batch=4):
    """Sustained roundtrip throughput INCLUDING the recurring host work.

    Streams n_vols DEVICE-RESIDENT volumes through the BATCHED stream
    APIs — the production RTM shape (volumes are born in HBM, containers
    leave to host, reconstructions stay in HBM).  All recurring host work
    (container assembly, segment planning, the one bundled d2h per batch)
    is inside the timed region; nothing is subtracted.  Returns
    per-volume (compress_s, decompress_s).
    """
    import jax
    import jax.numpy as jnp

    from cvxcompress_tpu import pipeline

    # ONE h2d + device-side scaling (avoids n_vols uploads of the volume)
    v0 = jax.device_put(vol)
    vd = [v0 * jnp.float32(1.0 + 1e-6 * j) for j in range(n_vols)]
    fetch1(vd[-1])
    # warm every compiled shape + host codepath
    datas0 = pipeline.compress_batched(vd[:batch], scale, block=block)
    outs0 = pipeline.decompress_batched(datas0, to_host=False)
    fetch1(outs0[-1])

    t0 = time.perf_counter()
    datas = [
        d for d, _ in pipeline.compress_stream_batched(
            vd, scale, block=block, batch=batch
        )
    ]
    t_c = (time.perf_counter() - t0) / n_vols

    t0 = time.perf_counter()
    outs = list(pipeline.decompress_stream_batched(
        datas, batch=batch, to_host=False
    ))
    fetch1(outs[-1])  # the stream's tail: everything before it is done
    t_d = (time.perf_counter() - t0) / n_vols
    return t_c, t_d


def bench_snapshots(vol, block, scale, iters=6):
    """DeviceSnapshotStack append/reconstruct throughput (HBM-resident).

    Timed by TWO-LENGTH DIFFERENCING like everything else (PERF_NOTES
    rule: never subtract a measured RTT from a short timed loop — the
    tunnel RTT jitters by several ms).  t = (T(2k) - T(k)) / k cancels
    the constant dispatch+fetch offset exactly.
    """
    import jax

    from cvxcompress_tpu.snapshots import DeviceSnapshotStack

    k = max(2, iters // 2)
    store = DeviceSnapshotStack(vol.shape, scale, block=block,
                                max_pending=2 * k + 1)
    vd = jax.device_put(vol)
    i0 = store.append(vd)
    fetch1(store._snaps[-1][0])  # pre-warm the payload-shape fetch path
    fetch1(store.get(i0))
    store.pop()
    vols = [vd * (1.0 + 1e-6 * j) for j in range(2 * k)]
    fetch1(vols[-1])

    def drain():
        store.flush()
        del store._snaps[:]

    def t_append(n):
        drain()
        t0 = time.perf_counter()
        for v in vols[:n]:
            store.append(v)
        fetch1(store._snaps[-1][0])
        return time.perf_counter() - t0

    def t_reconstruct(n):
        drain()
        for v in vols[:n]:
            store.append(v)
        store.flush()
        t0 = time.perf_counter()
        last = None
        for _ in range(n):
            last = store.pop()
        fetch1(last)
        return time.perf_counter() - t0

    def diff(f, reps=2):
        t1 = min(f(k) for _ in range(reps))
        t2 = min(f(2 * k) for _ in range(reps))
        if t2 > t1:
            return (t2 - t1) / k
        return t2 / (2 * k)  # upper bound, never nonsense

    t_app = diff(t_append)
    t_pop = diff(t_reconstruct)
    drain()
    return t_app, t_pop


def bench_block_sweep(budget, detail):
    """Per-block-size perf: transform fwd/inv and codec roundtrip.

    The reference publishes transform fwd+inv MCells/s for 8^3..256^3
    (README.md:35-40, harness CvxCompress.cpp:803-891); this sweep
    records the TPU numbers side by side, plus full codec compress /
    decompress at each size on a 256^3 sinusoid.  Transforms are chained
    K deep inside one jit (tunnel discipline).  Budget-gated per size and
    flushed per size.
    """
    import jax
    import jax.numpy as jnp

    from cvxcompress_tpu.ops import codec as jcodec
    from cvxcompress_tpu.ops import wavelet as dw

    K = 4
    sweep = detail.setdefault("block_sweep", {})
    sweep["reference_fwdinv_mcells_s"] = {
        "8c": 25725, "16c": 34178, "32c": 22680, "64c": 10934,
        "128c": 2962, "256c": 6661,
    }
    vol = make_volume(256, 256, 256)
    for bs in (8, 16, 32, 64, 128, 256):
        if not budget.admit(f"sweep_{bs}c", 35):
            continue
        n = max(1, (1 << 25) // bs**3)
        # transform throughput is data-independent: generate ON DEVICE
        # (a host standard_normal + upload cost ~6 s per size through
        # the tunnel; device RNG costs nothing measurable)
        import jax.random as jrandom

        x = jax.jit(
            lambda k: jrandom.normal(k, (n, bs, bs, bs), jnp.float32)
        )(jrandom.PRNGKey(bs))

        def chain(f):
            @jax.jit
            def run(x):
                for _ in range(K):
                    x = f(x)
                return x

            return run

        entry = {}
        for tag, f in (("fwd", dw.forward_3d), ("inv", dw.inverse_3d)):
            g = chain(f)
            fetch1(g(x))
            el = per_iter_time(lambda j: g(x), 2) / K  # 2 chains of K
            entry[f"transform_{tag}_mcells_s"] = round(n * bs**3 / el / 1e6)
        tf = entry["transform_fwd_mcells_s"]
        ti = entry["transform_inv_mcells_s"]
        entry["transform_fwdinv_mcells_s"] = round(
            2.0 / (1.0 / tf + 1.0 / ti)
        )

        block = (bs, bs, bs)
        data, _ = jcodec.compress(vol, 1e-2, block=block)
        t_c = bench_device_compress(vol, block, 1e-2, iters=3, reps=2)
        t_d, _ = bench_device_decompress(data, vol.shape, iters=3, reps=2)
        entry["compress_mcells_s"] = round(vol.size / t_c / 1e6)
        entry["decompress_mcells_s"] = round(vol.size / t_d / 1e6)
        sweep[f"{bs}c"] = entry
        log(f"[sweep {bs:3}^3] fwd {tf} MC/s inv {ti} MC/s "
            f"compress {entry['compress_mcells_s']} "
            f"decompress {entry['decompress_mcells_s']}")
        flush_partial(detail)
    return sweep


def bench_quality(vol, block, scale):
    from cvxcompress_tpu.ops import codec as jcodec

    jcodec.compress(vol, scale, block=block)  # warm (compiles, lib loads)
    data, ratio = jcodec.compress(vol, scale, block=block)
    out = jcodec.decompress(data)
    o = vol.astype(np.float64)
    d = o - out.astype(np.float64)
    err = float(np.sqrt((d * d).mean()) / np.sqrt((o * o).mean()))
    snr = -20.0 * np.log10(err) if err > 0 else float("inf")
    return data, ratio, err, snr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--budget", type=float, default=300.0,
                    help="wall-clock budget in seconds (default 300)")
    ap.add_argument("--full", action="store_true",
                    help="also run the tunnel-bound host-stream stage")
    args = ap.parse_args()

    budget = Budget(args.budget)
    detail = {"budget_s": args.budget, "skipped": budget.skipped}
    results = {}
    err_msg = None
    try:
        run_stages(args, budget, detail, results)
    except Exception as e:  # noqa: BLE001 — the JSON line must still print
        import traceback

        err_msg = f"{type(e).__name__}: {e}"
        traceback.print_exc(file=sys.stderr)

    detail["elapsed_s"] = round(budget.elapsed(), 1)
    if err_msg:
        detail["error"] = err_msg
    detail["baseline"] = {
        "reference_compress_mcells_s": BASELINE_COMPRESS,
        "reference_decompress_mcells_s": BASELINE_DECOMPRESS,
        "reference_roundtrip_mcells_s": BASELINE_ROUNDTRIP,
        "north_star_compress_gcells_s": 5,
        "north_star_decompress_gcells_s": 8,
    }
    a = results.get("A_ref_ci_32c", {})
    c = a.get("device_compress_mcells_s")
    d = a.get("device_decompress_mcells_s")
    if c and d:
        headline = 2.0 / (1.0 / c + 1.0 / d)
    else:
        headline = 0.0
    out = {
        "metric": "device_roundtrip_320x416x352_32c_scale1e-2",
        "value": round(headline, 1),
        "unit": "MCells/s",
        "vs_baseline": round(headline / BASELINE_ROUNDTRIP, 3),
        "detail": detail,
    }
    # the honest companion: the sustained roundtrip WITH host work
    # included (batched stream APIs), reported at top level next to the
    # device-only figure so the number that includes host work is the
    # one defended each round
    sc = a.get("pipelined_sustained_compress_mcells_s")
    sd = a.get("pipelined_sustained_decompress_mcells_s")
    if sc and sd:
        sus = 2.0 / (1.0 / sc + 1.0 / sd)
        out["sustained_roundtrip_mcells_s"] = round(sus, 1)
        out["sustained_vs_baseline"] = round(sus / BASELINE_ROUNDTRIP, 3)
    flush_partial(detail)
    print(json.dumps(out), flush=True)


def run_stages(args, budget, detail, results):
    import jax

    dev = jax.devices()[0]
    log("device:", dev)
    rtt = measure_rtt()
    log(f"tunnel RTT: {rtt*1e3:.1f} ms")
    detail["tunnel_rtt_ms"] = round(rtt * 1e3, 1)
    flush_partial(detail)

    # per-stage wall clock: the round-4 record overran its budget because
    # the mandatory stages' costs were never measured — record them so the
    # estimates stay honest
    stage_s = detail.setdefault("stage_s", {})

    def mark(stage_name, t_start):
        stage_s[stage_name] = round(time.monotonic() - t_start, 1)

    if args.quick:
        shape_a, block_a = (160, 192, 160), (32, 32, 32)
        shape_b, block_b = (256, 256, 256), (128, 128, 128)
        iters, n_stream = 3, 4
    else:
        shape_a, block_a = (352, 416, 320), (32, 32, 32)
        shape_b, block_b = (384, 384, 384), (128, 128, 128)
        iters, n_stream = 6, 8

    scale = 1e-2
    for name, shape, block in (
        ("A_ref_ci_32c", shape_a, block_a),
        ("B_north_star_128c", shape_b, block_b),
    ):
        # the headline (device A) always runs; B is budget-gated
        if name != "A_ref_ci_32c" and not budget.admit(name, 60):
            continue
        from cvxcompress_tpu.ops import codec as jcodec

        t_stage = time.monotonic()
        vol = make_volume(*shape)
        ncells = vol.size
        data, ratio, err, snr = bench_quality(vol, block, scale)
        mark(f"{name}_quality", t_stage)
        host_asm = jcodec.last_host_assembly_s
        log(f"[{name}] ratio={ratio:.0f} err={err:.2e} snr={snr:.1f}dB")
        if name == "A_ref_ci_32c":
            # the reference CI bars, asserted on the reference CI input
            # (Test_With_Generated_Input.cpp:121-122); --quick shrinks the
            # volume, which legitimately shifts quality off the full-size
            # bars — quick mode asserts scale-appropriate ones (measured
            # SNR 74.3 dB / err 1.93e-4 on the quick volume) so CI's
            # bench smoke still catches a broken quantizer
            e_bar, s_bar = (4e-4, 70.0) if args.quick else (2e-4, 75.0)
            assert err < e_bar and snr > s_bar, (
                f"quality bars FAILED: err={err:.3e} snr={snr:.1f}"
            )

        t_stage = time.monotonic()
        t_c = bench_device_compress(vol, block, scale, iters)
        t_d, t_plan = bench_device_decompress(data, shape, iters)
        mark(f"{name}_device", t_stage)
        dev_c = ncells / t_c / 1e6
        dev_d = ncells / t_d / 1e6
        log(f"[{name}] device compress {t_c*1e3:.2f} ms = {dev_c:.0f} MC/s "
            f"(+{host_asm*1e3:.1f} ms host assembly); "
            f"decompress {t_d*1e3:.2f} ms = {dev_d:.0f} MC/s "
            f"(+{t_plan*1e3:.1f} ms host plan; entropy decode ON device)")

        results[name] = {
            "cells": int(ncells),
            "ratio": round(float(ratio), 1),
            "rel_error": float(err),
            "snr_db": round(snr, 1),
            "device_compress_mcells_s": round(dev_c, 1),
            "device_decompress_mcells_s": round(dev_d, 1),
            "host_assembly_ms": round(host_asm * 1e3, 2),
            "host_plan_ms": round(t_plan * 1e3, 2),
        }
        detail[name] = results[name]
        flush_partial(detail)

        if budget.admit(f"{name}_sustained", 45):
            t_stage = time.monotonic()
            t_sc, t_sd = bench_sustained(
                vol, block, scale, n_vols=n_stream, batch=max(2, n_stream // 2)
            )
            sus_c, sus_d = ncells / t_sc / 1e6, ncells / t_sd / 1e6
            log(f"[{name}] sustained (host work included, {n_stream} vols, "
                f"batched stream API): compress {sus_c:.0f} MC/s, "
                f"decompress {sus_d:.0f} MC/s")
            results[name]["pipelined_sustained_compress_mcells_s"] = round(
                sus_c, 1
            )
            results[name]["pipelined_sustained_decompress_mcells_s"] = round(
                sus_d, 1
            )
            mark(f"{name}_sustained", t_stage)
            flush_partial(detail)

        if budget.admit(f"{name}_local_rms", 40):
            # local-RMS on the FUSED paths (round-4): one code path for
            # both RMS modes, like CvxCompress.cpp:343-348
            t_stage = time.monotonic()
            t_lc = bench_device_compress(
                vol, block, scale, iters, use_local=True
            )
            loc_c = ncells / t_lc / 1e6
            log(f"[{name}] device compress LOCAL-RMS {t_lc*1e3:.2f} ms = "
                f"{loc_c:.0f} MC/s ({loc_c/dev_c:.2f}x of global)")
            results[name]["device_compress_local_rms_mcells_s"] = round(
                loc_c, 1
            )
            mark(f"{name}_local_rms", t_stage)
            flush_partial(detail)

        if budget.admit(f"{name}_snapshots", 30):
            t_stage = time.monotonic()
            t_app, t_pop = bench_snapshots(vol, block, scale, iters)
            snap_a, snap_p = ncells / t_app / 1e6, ncells / t_pop / 1e6
            log(f"[{name}] snapshot stack append {snap_a:.0f} MC/s, "
                f"reconstruct {snap_p:.0f} MC/s")
            results[name]["snapshot_append_mcells_s"] = round(snap_a, 1)
            results[name]["snapshot_reconstruct_mcells_s"] = round(snap_p, 1)
            mark(f"{name}_snapshots", t_stage)
            flush_partial(detail)

        if args.full and budget.admit(f"{name}_host_stream", 180):
            t_h, _ = bench_host_stream(vol, block, scale, n_vols=2)
            host_c = ncells / t_h / 1e6
            log(f"[{name}] host-path pipelined compress {t_h*1e3:.0f} ms/vol"
                f" = {host_c:.0f} MC/s (tunnel-bound)")
            results[name]["host_pipelined_compress_mcells_s"] = round(
                host_c, 1
            )
            flush_partial(detail)

    if not args.quick and budget.admit("block_sweep", 40):
        t_stage = time.monotonic()
        bench_block_sweep(budget, detail)
        mark("block_sweep", t_stage)


if __name__ == "__main__":
    main()
