#!/usr/bin/env python
"""Round-5 probe: snapshot stack append/get at the CI config (plane rows)."""
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


def fetch1(x):
    return np.asarray(jnp.ravel(x)[:1])


def per_iter(run, iters, reps=3):
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


def main():
    shape, block, scale = (352, 416, 320), (32, 32, 32), 1e-2
    from cvxcompress_tpu.snapshots import DeviceSnapshotStack
    from cvxcompress_tpu.utils import volumes

    vol = volumes.sinusoid_volume(*shape, periods=10)
    vd = [jax.device_put(vol), jax.device_put(vol * 1.0000001)]
    fetch1(vd[1])
    ncells = vol.size
    out = {}

    store = DeviceSnapshotStack(shape, scale, block=block, max_pending=17)
    print("plane mode:", store._plane, file=sys.stderr)
    i0 = store.append(vd[0])
    store.flush()
    fetch1(store.get(i0))
    t = per_iter(lambda j: store.get(i0), 4)
    out["snapshot_get"] = {"ms": round(t * 1e3, 3),
                           "mcells_s": round(ncells / t / 1e6)}
    print(f"get: {t*1e3:.2f} ms = {ncells/t/1e6:.0f} MC/s", file=sys.stderr)

    def t_append(n):
        del store._snaps[:]
        store._pending.clear()
        best = float("inf")
        for _ in range(3):
            del store._snaps[:]
            store._pending.clear()
            t0 = time.perf_counter()
            for j in range(n):
                store.append(vd[j % 2])
            fetch1(store._snaps[-1][0])
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = t_append(4), t_append(8)
    t = (t2 - t1) / 4 if t2 > t1 else t2 / 8
    out["snapshot_append"] = {"ms": round(t * 1e3, 3),
                              "mcells_s": round(ncells / t / 1e6)}
    print(f"append: {t*1e3:.2f} ms = {ncells/t/1e6:.0f} MC/s",
          file=sys.stderr)
    out["nbytes_mb"] = round(store.nbytes() / len(store._snaps) / 1e6, 2)
    out["ratio"] = round(store.ratio(), 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
