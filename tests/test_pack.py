"""Log-shift compaction primitive (ops/pack.py) vs NumPy reference."""

import jax.numpy as jnp
import numpy as np

from cvxcompress_tpu.ops import pack


def test_compact_live_random(rng):
    # few distinct shapes (each shape compiles once)
    for L, R, p in [(64, 3, 0.3), (64, 3, 0.9), (257, 2, 0.5), (1024, 1, 0.02)]:
        live = rng.random((R, L)) < p
        vals = rng.integers(1, 250, (R, L)).astype(np.int32)
        (pv,), cnt = pack.compact_live((jnp.asarray(vals),), jnp.asarray(live))
        pv, cnt = np.asarray(pv), np.asarray(cnt)
        for r in range(R):
            want = vals[r][live[r]]
            assert cnt[r] == live[r].sum()
            np.testing.assert_array_equal(pv[r][: cnt[r]], want)


def test_compact_live_edge_masks():
    for live in (
        np.zeros(32, bool),
        np.ones(32, bool),
        np.eye(1, 32, 31, dtype=bool)[0],  # only last
        np.eye(1, 32, 0, dtype=bool)[0],  # only first
    ):
        vals = np.arange(1, 33, dtype=np.int32)
        (pv,), cnt = pack.compact_live(
            (jnp.asarray(vals)[None],), jnp.asarray(live)[None]
        )
        want = vals[live]
        np.testing.assert_array_equal(np.asarray(pv)[0][: int(cnt[0])], want)


def test_compact_multiple_arrays(rng):
    live = rng.random((2, 128)) < 0.4
    a = rng.integers(0, 1000, (2, 128)).astype(np.int32)
    b = rng.standard_normal((2, 128)).astype(np.float32)
    bb = jnp.asarray(b).view(jnp.int32)
    (pa, pb), cnt = pack.compact_live(
        (jnp.asarray(a), bb), jnp.asarray(live)
    )
    pa, pb = np.asarray(pa), np.asarray(pb).view(np.float32)
    for r in range(2):
        n = int(cnt[r])
        np.testing.assert_array_equal(pa[r][:n], a[r][live[r]])
        np.testing.assert_array_equal(pb[r][:n], b[r][live[r]])


def test_compact_rows_cost_staging(rng):
    """Byte-staging pattern: 5 slots/cell, cost in 0..5, dist = 5i - off."""
    Q = 96
    for _ in range(4):
        R = 3
        cost = rng.integers(0, 6, (R, Q)).astype(np.int32)
        off = np.cumsum(cost, axis=1) - cost
        staging = rng.integers(0, 255, (R, Q * 5)).astype(np.int32)
        k = np.arange(Q * 5) % 5
        i = np.arange(Q * 5) // 5
        livem = k[None] < cost[:, i]
        dist = np.where(livem, 5 * i[None] - off[:, i], -1).astype(np.int32)
        out, _ = pack.compact_rows(
            jnp.asarray(staging), jnp.asarray(dist), pack.ceil_log2(5 * Q)
        )
        out = np.asarray(out)
        for r in range(R):
            want = staging[r][livem[r]]
            np.testing.assert_array_equal(out[r][: want.size], want)
