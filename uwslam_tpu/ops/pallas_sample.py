"""Pallas TPU kernel: fused multi-channel bilinear sampling at scattered points.

The tracking hot loop samples (intensity, grad_x, grad_y) at N warped
subpixel locations per LM iteration. The XLA formulation
(image.pyramid.bilinear_sample_dense) lowers to two chained contractions and
round-trips the (C, N, W) intermediate through HBM; this kernel builds the
bilinear one-hot row/column weights on-chip and runs both contractions from
VMEM in one pass:

    out[c, n] = sum_h Wv[n, h] * ( sum_w images[c, h, w] * ... )
             == dot(Wv, images[c]) row-dotted with Wu

Grid: one program per tile of TN points; the whole (C, H, W) image stack is
resident in VMEM (level-0 TUM stack = 3 x 480 x 640 f32 = 3.7 MB << 16 MB).
The MXU does the (TN, H) x (H, W) dot; the VPU does the Wu row-dot.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 512


def _sample_kernel(uv_ref, img_ref, out_ref, *, C, W):
    # img_ref is (H, C*W): channels folded into the lane axis so the whole
    # row gather is ONE (TN, H) x (H, C*W) MXU dot.
    H = img_ref.shape[0]
    uv = uv_ref[:]                       # (TN, 2)
    u = uv[:, 0]
    v = uv[:, 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = (u - u0)[:, None]
    dv = (v - v0)[:, None]

    rows = jax.lax.broadcasted_iota(jnp.int32, (1, H), 1).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(jnp.float32)
    Wv = (rows == v0[:, None]) * (1.0 - dv) + (rows == v0[:, None] + 1.0) * dv
    Wu = (cols == u0[:, None]) * (1.0 - du) + (cols == u0[:, None] + 1.0) * du

    S = jnp.dot(Wv, img_ref[:], preferred_element_type=jnp.float32)  # (TN, C*W)
    for c in range(C):
        out_ref[c, :] = jnp.sum(S[:, c * W:(c + 1) * W] * Wu, axis=1)


@functools.partial(jax.jit, static_argnames=("tile_n",))
def pallas_bilinear_sample(
    images: jax.Array, uv: jax.Array, tile_n: int = TILE_N
):
    """images (C, H, W) f32, uv (N, 2) f32 with N % tile_n == 0.

    Returns ((C, N) samples, (N,) valid). Out-of-bounds points sample the
    clamped one-hot rows (then masked invalid), matching
    bilinear_sample_dense's fill=0 contract via the valid mask."""
    C, H, W = images.shape
    N = uv.shape[0]
    assert N % tile_n == 0, (N, tile_n)
    grid = (N // tile_n,)
    # Fold channels into the lane axis: (C, H, W) -> (H, C*W).
    img_hcw = jnp.transpose(images, (1, 0, 2)).reshape(H, C * W)
    out = pl.pallas_call(
        functools.partial(_sample_kernel, C=C, W=W),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C * W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, N), jnp.float32),
    )(uv, img_hcw)
    # Validity is cheap elementwise math; keep it outside the kernel (1-D
    # bool outputs hit TPU layout-tiling mismatches).
    u, v = uv[:, 0], uv[:, 1]
    valid = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    zero = jnp.zeros_like(out)
    return jnp.where(valid[None, :], out, zero), valid
