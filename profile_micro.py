import time

import jax
import jax.numpy as jnp
import numpy as np


def t(fn, *a, iters=5):
    """Fetch-based timing: np.asarray of a tiny slice forces completion."""
    out = fn(*a)
    _ = np.asarray(jnp.ravel(out)[:1])
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*a)
        _ = np.asarray(jnp.ravel(out)[:1])
        best = min(best, time.perf_counter() - t0)
    return best


k = jax.random.PRNGKey(0)

# RTT floor: trivial op + fetch
tiny = jnp.zeros((8,), jnp.float32)
f = jax.jit(lambda a: a + 1)
el = t(f, tiny)
print(f"RTT floor (tiny op + fetch): {el*1e3:.2f} ms")

for n, dt in ((4096, jnp.bfloat16), (4096, jnp.float32)):
    a = jax.random.normal(k, (n, n), dt)
    b = jax.random.normal(k, (n, n), dt)
    f = jax.jit(lambda a, b: a @ b)
    el = t(f, a, b)
    print(f"{n}^3 matmul {dt.__name__}: {el*1e3:.2f} ms = {2*n**3/el/1e12:.1f} TFLOP/s")

x = jax.random.normal(k, (262144, 128), jnp.float32)
w = jax.random.normal(k, (128, 128), jnp.float32)
for prec in ("default", "float32", "highest"):
    f = jax.jit(lambda a, b: jax.lax.dot(a, b, precision=prec))
    el = t(f, x, w)
    print(f"(262144,128)@(128,128) {prec}: {el*1e3:.2f} ms = {2*262144*128*128/el/1e12:.2f} TFLOP/s")

big = jax.random.normal(k, (64, 1024, 1024), jnp.float32)  # 256 MB
f = jax.jit(lambda a: a * 2.0 + 1.0)
el = t(f, big)
print(f"elementwise 256MB: {el*1e3:.2f} ms = {2*big.nbytes/el/1e9:.0f} GB/s")

from cvxcompress_tpu.ops import wavelet

wm = jnp.asarray(wavelet.forward_matrix(128), jnp.float32)
blocks = jax.random.normal(k, (32, 128, 128, 128), jnp.float32)  # 256 MB
hi = jax.lax.Precision.HIGHEST
for name, eq in (("x", "...zyx,Xx->...zyX"), ("y", "...zyx,Yy->...zYx"), ("z", "...zyx,Zz->...Zyx")):
    f = jax.jit(lambda a, m, eq=eq: jnp.einsum(eq, a, m, precision=hi, preferred_element_type=jnp.float32))
    el = t(f, blocks, wm)
    print(f"einsum {name} HIGHEST: {el*1e3:.2f} ms = {blocks.size/el/1e6:.0f} MC/s")

f = jax.jit(wavelet.forward_3d)
el = t(f, blocks)
print(f"forward_3d 128^3 x32: {el*1e3:.2f} ms = {blocks.size/el/1e6:.0f} MC/s")
