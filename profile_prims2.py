"""Second round: gather variants + log-shift compaction building blocks."""

import time

import jax
import jax.numpy as jnp
import numpy as np

K = 20


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


tiny = jnp.zeros((8,), jnp.float32)
RTT = timed(jax.jit(lambda a: a + 1), tiny)
print(f"RTT: {RTT*1e3:.1f} ms")


def rep(name, el, cells):
    dev = max((el - RTT) / K, 1e-9)
    print(f"{name}: {dev*1e3:.3f} ms/iter -> {cells/dev/1e9:.3f} Gelem/s")


def timed_loop(name, nelem, body0, *arrays):
    @jax.jit
    def f(*arrays):
        def body(i, c):
            return body0(c, *arrays).astype(jnp.float32) * 1e-30
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    rep(name, timed(f, *arrays), nelem)


k0 = jax.random.PRNGKey(0)
ci = lambda c: c.astype(jnp.int32)  # noqa: E731

# take of 2M indices from tables of varying size
for tabsize in (1 << 12, 1 << 16, 1 << 20):
    tab = jax.random.normal(k0, (tabsize,), jnp.float32)
    idx = jax.random.randint(k0, (1 << 21,), 0, tabsize - 1, jnp.int32)
    timed_loop(f"take 2M from {tabsize>>10}K table", 1 << 21,
               lambda c, t, i: jnp.take(t, i + ci(c) % 2)[0], tab, idx)

# take_along_axis: per-row gather, rows of 640, 65536 rows (41M elements)
R, L = 1 << 16, 640
rows = jax.random.normal(k0, (R, L), jnp.float32)
ridx = jax.random.randint(k0, (R, L), 0, L - 1, jnp.int32)
timed_loop("take_along_axis (64K,640)", R * L,
           lambda c, r, i: jnp.take_along_axis(r, i + ci(c) % 2, axis=1)[0, 0],
           rows, ridx)

# one log-shift round: select + left-roll by s of (64K, 640) + select
def shift_round(x, dist, s):
    moved = jnp.roll(x, -s, axis=1)
    mdist = jnp.roll(dist, -s, axis=1)
    take = (mdist & s) != 0
    return jnp.where(take, moved, x), jnp.where(take, mdist - s, dist)


def compact_logshift(x, dist):
    for b in range(10):  # distances < 640 < 1024
        x, dist = shift_round(x, dist, 1 << b)
    return x


xb = jax.random.randint(k0, (R, L), 0, 255, jnp.int32)
# monotone non-decreasing distances per row
d0 = jnp.sort(jax.random.randint(k0, (R, L), 0, L - 1, jnp.int32), axis=1)
timed_loop("logshift compact 10 rounds (64K,640) i32", R * L,
           lambda c, x, d: compact_logshift(x + ci(c) % 2, d)[0, 0], xb, d0)

# same in uint8
xb8 = xb.astype(jnp.uint8)
timed_loop("logshift compact 10 rounds (64K,640) u8", R * L,
           lambda c, x, d: compact_logshift(x + (ci(c) % 2).astype(jnp.uint8), d)[0, 0],
           xb8, d0)

# cumsum over axis 1 for (64K, 640)
timed_loop("cumsum (64K,640)", R * L,
           lambda c, x: jnp.cumsum(x + ci(c), axis=1)[0, -1], xb)

# segment reduce: (64K,640) -> (64K,) sums
timed_loop("row sums (64K,640)", R * L,
           lambda c, x: (x + ci(c)).sum(axis=1)[0], xb)

# dynamic_slice-based variable roll? one roll per row via matmul perm: skip.

# multi-dim chunk gather: gather 8K rows of (640,) u8 from 64K
gi = jnp.sort(jax.random.randint(k0, (1 << 13,), 0, R - 1, jnp.int32))
timed_loop("row gather 8K x 640B u8", (1 << 13) * L,
           lambda c, x, i: jnp.take(x, i + ci(c) % 2, axis=0)[0, 0], xb8, gi)
