"""Fused stripe INVERSE wavelet kernel (decode side).

The decode's staged inverse (apply_x_inverse_rows + inverse_3d_volume)
is three full-size einsum passes over the coefficient plane — measured
3.4 ms inside the fused decode program at the reference CI config
(round 4 bisect) against a ~0.55 ms read+write traffic roofline.  This
kernel runs all three inverse cascades in ONE VMEM residency per
(bz, by, W) block row — the decode-side twin of the compress side's
stripe-fused kernel (tokenize_pallas._kernel_stripe_fused), mirroring
the reference's everything-in-cache inverse
(Wavelet_Transform_Fast.cpp:148-279) the TPU way.

Axis order matches the staged path (x, then y, then z —
Wavelet_Transform_Slow.cpp:296-300); accumulation order inside the MXU
differs by ~1 ulp, the same 1e-5 transform contract as every other
kernel/staged pair.  The x operator doubles as the x-UNPAD: its columns
are clipped to nx, so phantom x-pad block columns never leave VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import tokenize_pallas as tp
from . import wavelet


def stripe_inverse_ok(vol_shape3, block):
    """Same geometry envelope as the compress-side stripe-fused kernel."""
    return tp.stripe_fused_ok(vol_shape3, block)


def block_inverse_ok(vol_shape3, block):
    """(128,128,128) blocks over block-aligned dims (north-star shape):
    same envelope as the compress-side whole-block kernel."""
    from . import fused_compress as fc

    return fc.fused_path_ok(vol_shape3, block)


def _kernel_block_inv(p_ref, opxti_ref, opyi_ref, opzi_ref, out_ref, sA, *,
                      split):
    """One (128,128,128) block: x, y, then z inverse in one VMEM
    residency (decode twin of fused_compress._kernel_block)."""
    B = 128
    opxti = opxti_ref[:]
    opyi = opyi_ref[:]
    opzi = opzi_ref[:]
    a4 = p_ref[:, 0, :, :]  # (bz, by, bx)
    for z in range(B):
        t = tp.mxu_dot3(a4[z], opxti, split)   # x inverse
        sA[z, :, :] = tp.mxu_dot3(opyi, t, split)  # y inverse
    for y in range(B):
        out_ref[:, 0, y, :] = tp.mxu_dot3(opzi, sA[:, y, :], split)


@functools.partial(
    jax.jit, static_argnames=("vol_shape3", "block", "interpret")
)
def block_fused_inverse(plane, vol_shape3, block, interpret=False):
    """(nz*ny, nx) volume-order coefficient plane -> (nz, ny, nx), one
    whole-block kernel pass (128³ blocks, aligned dims)."""
    nz, ny, nx = vol_shape3
    B = 128
    nbz, nby, nbx = nz // B, ny // B, nx // B
    assert plane.shape == (nz * ny, nx)
    p4 = plane.reshape(nz, nby, B, nx)
    opxti = jnp.asarray(wavelet._blockdiag(B, B, inverse=True).T)
    opyi = wavelet._f32(wavelet.inverse_matrix(B))
    opzi = wavelet._f32(wavelet.inverse_matrix(B))
    split = False  # HIGHEST wins for 128-wide dots (fused_compress)

    def in_map(zb, yb, xb):
        return (zb, yb, 0, xb)

    out = pl.pallas_call(
        functools.partial(_kernel_block_inv, split=split),
        grid=(nbz, nby, nbx),
        in_specs=[
            pl.BlockSpec((B, 1, B, B), in_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B), lambda zb, yb, xb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B), lambda zb, yb, xb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B), lambda zb, yb, xb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, 1, B, B), in_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz, nby, B, nx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, B, B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(p4, opxti, opyi, opzi)
    return out.reshape(nz, ny, nx)


def _kernel_stripe_inv(p_ref, opxti_ref, opyi_ref, opzi_ref, out_ref,
                       sX, sY, *, geom, split):
    bx, by, bz, nxo = geom
    a4 = p_ref[:, 0, :, :]  # (bz, by, W) coefficient slab
    opxti = opxti_ref[:]    # (W, nxo): block-diag inverse, columns x-clipped
    opyi = opyi_ref[:]
    opzi = opzi_ref[:]
    for z in range(bz):
        t = tp.mxu_dot3(a4[z], opxti, split)  # x inverse + unpad
        sX[z * by : (z + 1) * by, :] = tp.mxu_dot3(opyi, t, split)
    vA = sX[:].reshape(bz, by, nxo)
    for y in range(by):
        sY[y * bz : (y + 1) * bz, :] = tp.mxu_dot3(opzi, vA[:, y, :], split)
    vB = sY[:].reshape(by, bz, nxo)
    for z in range(bz):
        out_ref[z, 0, :, :] = vB[:, z, :]


@functools.partial(
    jax.jit, static_argnames=("vol_shape3", "block", "interpret")
)
def stripe_fused_inverse(plane, vol_shape3, block, interpret=False):
    """(nzp*nyp, nxp2) volume-order coefficient plane -> (nz, ny, nx).

    Drop-in for apply_x_inverse_rows + inverse_3d_volume on
    stripe_inverse_ok geometries (same x->y->z order, ~1 ulp MXU
    accumulation differences inside the 1e-5 transform contract).
    """
    nz, ny, nx = vol_shape3
    bx, by, bz = block
    nbz, nby, nbx = -(-nz // bz), -(-ny // by), -(-nx // bx)
    nbx2 = wavelet.padded_nbx(nbx, bx)
    nzp, nyp, W = nbz * bz, nby * by, nbx2 * bx
    assert plane.shape == (nzp * nyp, W)
    p4 = plane.reshape(nzp, nby, by, W)
    geom = (bx, by, bz, nx)
    # apply_x_rows computes rows @ blockdiag.T; clipping the multiplier's
    # columns to nx drops the phantom x-pad block columns in the dot
    opxti = jnp.asarray(
        wavelet._blockdiag(bx, W, inverse=True).T[:, :nx]
    )
    opyi = wavelet._f32(wavelet.inverse_matrix(by)) if by > 1 else \
        jnp.eye(max(by, 1), dtype=jnp.float32)
    opzi = wavelet._f32(wavelet.inverse_matrix(bz)) if bz > 1 else \
        jnp.eye(max(bz, 1), dtype=jnp.float32)
    split = (
        wavelet.FLOAT_PREC is jax.lax.Precision.HIGH and not interpret
    )

    def in_map(byi, zt):
        return (zt, byi, 0, 0)

    TRS = bz * by
    out = pl.pallas_call(
        functools.partial(_kernel_stripe_inv, geom=geom, split=split),
        grid=(nby, nbz),
        in_specs=[
            pl.BlockSpec((bz, 1, by, W), in_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, nx), lambda byi, zt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((by, by), lambda byi, zt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bz, bz), lambda byi, zt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bz, 1, by, nx), in_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nzp, nby, by, nx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TRS, nx), jnp.float32),  # x+y result
            pltpu.VMEM((TRS, nx), jnp.float32),  # z result (y-major)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(p4, opxti, opyi, opzi)
    return out.reshape(nzp, nyp, nx)[:nz, :ny]
