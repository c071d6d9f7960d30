"""Primitive costs on TPU, RTT-amortized via fori_loop inside one jit.

All big arrays are passed as jit ARGUMENTS (closure constants get inlined
into the program and break the remote-compile size limit).
"""

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
    print(f"{name}: {dev*1e3:.3f} ms/iter -> {cells/dev/1e9:.2f} GC/s")


def timed_loop(name, cells, body0, *arrays):
    """body0(c, *arrays) -> scalar; runs K times with data dep through c."""

    @jax.jit
    def f(*arrays):
        def body(i, c):
            return body0(c, *arrays).astype(jnp.float32) * 1e-30
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    el = timed(f, *arrays)
    rep(name, el, cells)


k0 = jax.random.PRNGKey(0)
N, C = 32, 128 * 128 * 128
cells = N * C
x = jax.random.normal(k0, (N, C), jnp.float32)
xi = (x * 3).astype(jnp.int32)

ci = lambda c: c.astype(jnp.int32)  # noqa: E731

timed_loop("cumsum minor (N,C) i32", cells,
           lambda c, xi: jnp.cumsum(xi + ci(c), axis=1, dtype=jnp.int32)[0, -1], xi)
timed_loop("cummax minor (N,C) i32", cells,
           lambda c, xi: jax.lax.cummax(xi + ci(c), axis=1)[0, -1], xi)

U = jnp.triu(jnp.ones((128, 128), jnp.float32))


def mm_cumsum(v, U):  # v (N, C) f32
    t = v.reshape(-1, 128)
    s1 = jax.lax.dot(t, U, precision="float32")
    tot1 = s1[:, -1].reshape(-1, 128)
    s2 = jax.lax.dot(tot1, U, precision="float32")
    tot2 = s2[:, -1].reshape(N, -1)
    s3 = jnp.cumsum(tot2, axis=1)
    carry2 = (s2 - tot1) + (s3 - tot2).reshape(-1)[:, None]
    out = s1 + carry2.reshape(-1)[:, None]
    return out.reshape(N, C)


timed_loop("mm_cumsum minor (N,C) f32", cells,
           lambda c, x, U: mm_cumsum(x + c, U)[0, -1], x, U)

timed_loop("reshape(...,8).sum", cells,
           lambda c, xi: (xi + ci(c)).reshape(N, C // 8, 8).sum(-1)[0, -1], xi)

G = (jnp.arange(128)[:, None] // 8 == jnp.arange(16)[None, :]).astype(jnp.float32)
timed_loop("group sums via matmul", cells,
           lambda c, x, G: jax.lax.dot((x + c).reshape(-1, 128), G,
                                       precision="float32")[0, -1], x, G)

g16 = jax.random.normal(k0, (N * C // 128, 16), jnp.float32)
timed_loop("group broadcast via matmul", cells,
           lambda c, g, G: jax.lax.dot(g + c, G.T, precision="float32")[0, -1], g16, G)

r8 = jax.random.normal(k0, (N, C // 8), jnp.float32)
timed_loop("jnp.repeat x8", cells,
           lambda c, r: jnp.repeat(r + c, 8, axis=1)[0, -1], r8)

table = jax.random.normal(k0, (cells,), jnp.float32)
for Kc in (1 << 21, 1 << 24):
    idx = jax.random.randint(k0, (Kc,), 0, cells - 1, jnp.int32)
    timed_loop(f"random take {Kc>>20}M from 67M", Kc,
               lambda c, t, i: jnp.take(t, i + ci(c) % 2)[0], table, idx)
    sidx = jnp.sort(idx)
    timed_loop(f"sorted take {Kc>>20}M from 67M", Kc,
               lambda c, t, i: jnp.take(t, i + ci(c) % 2)[0], table, sidx)

Kc = 1 << 21
pos = jax.random.permutation(k0, cells)[:Kc]
spos = jnp.sort(pos)
val = jax.random.normal(k0, (Kc,), jnp.float32)
zer = jnp.zeros((cells,), jnp.float32)
timed_loop("sorted unique scatter 2M into 67M", Kc,
           lambda c, z, p, v: z.at[p].set(v + c, unique_indices=True,
                                          indices_are_sorted=True)[0],
           zer, spos, val)

tab2 = table.reshape(-1, 1024)
ridx = jnp.sort(jax.random.randint(k0, (tab2.shape[0],), 0, tab2.shape[0] - 1,
                                   jnp.int32))
timed_loop("chunk-row gather 67K x 4KB", cells,
           lambda c, t, i: jnp.take(t, i + ci(c) % 2, axis=0)[0, 0], tab2, ridx)
