"""Fused Pallas TPU kernel for the tracking hot loop: warp -> project ->
bilinear sample, all stages VMEM-resident.

Replaces the reference's #1 hot spot (the per-point warp/residual loop at
/root/reference/src/Tracker.cpp:706-764) AND fixes the XLA one-hot
formulation's real cost on TPU. Profiling the full tracking chunk shows the
two-einsum path (image.pyramid.bilinear_sample_dense) is not MXU-bound but
HBM-bound at stage 2: the (N, W) row-interpolated intermediate (5.2 MB per
pair at the TUM design point) is written by the stage-1 matmul and re-read
by the stage-2 reduce — matmul outputs cannot fuse with consumers on TPU.
This kernel:

- computes the warp p_t = T·p3d and the projection uv INSIDE the kernel
  (no (N, 2) uv round trip, no separate XLA ops per LM iteration),
- builds the bilinear one-hot row/column weights on-chip,
- runs stage 1 on the MXU in bf16 with f32 accumulation — exactly the
  arithmetic XLA's DEFAULT-precision einsum uses, so results match the
  shipped path while running the MXU at its bf16 rate (an earlier f32
  `jnp.dot` variant of this kernel ran 1.5x SLOWER than XLA, measured),
- does stage 2 (column weighting + reduce) on the VPU from VMEM,
- emits only the (C, N) samples: nothing O(N·W) ever touches HBM.

Channels are folded into the lane axis ((C, H, W) -> (H, C·W)) so the
stage-1 gather of intensity + both gradients is ONE matmul. The whole
level-0 TUM stack (480 x 1920 bf16 = 1.8 MB) stays resident in VMEM across
grid steps.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 512


def _kernel(T_ref, p3d_ref, img_ref, out_ref, *, C, W, fx, fy, cx, cy):
    """One tile of points: warp -> project -> bilinear sample (C channels).

    T_ref (4, 4) f32; p3d_ref (TN, 3) f32; img_ref (H, C*W) bf16;
    out_ref (C, TN) f32. Out-of-bounds / behind-camera points produce
    garbage samples here and are masked by the caller (validity is cheap
    elementwise math on p3d/T that XLA fuses into the surrounding ops)."""
    H = img_ref.shape[0]
    p = p3d_ref[:]                                   # (TN, 3)
    T = T_ref[:]                                     # (4, 4)
    # Warp: p_t = R p + t. (TN, 3) x (3, 3) is too thin for the MXU to help;
    # expressed as VPU broadcasts.
    R = T[:3, :3]
    t = T[:3, 3]
    px = p[:, 0] * R[0, 0] + p[:, 1] * R[0, 1] + p[:, 2] * R[0, 2] + t[0]
    py = p[:, 0] * R[1, 0] + p[:, 1] * R[1, 1] + p[:, 2] * R[1, 2] + t[1]
    pz = p[:, 0] * R[2, 0] + p[:, 1] * R[2, 1] + p[:, 2] * R[2, 2] + t[2]
    zi = 1.0 / jnp.where(jnp.abs(pz) < 1e-9, 1e-9, pz)
    u = fx * px * zi + cx
    v = fy * py * zi + cy
    # Clamp into the valid bilinear window: keeps the one-hot rows in range
    # (bilinear_sample_dense's fill=0 contract is restored by the caller's
    # mask).
    u = jnp.clip(u, 0.0, W - 1.001)
    v = jnp.clip(v, 0.0, H - 1.001)
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = (u - u0)[:, None]
    dv = (v - v0)[:, None]
    u0i = u0.astype(jnp.int32)[:, None]
    v0i = v0.astype(jnp.int32)[:, None]

    # Mosaic iota must be integer-typed; the equality masks select the two
    # bilinear taps and the float weights are applied by multiplication.
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, H), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    # Row interpolation as a one-hot matmul (MXU, bf16 x bf16 -> f32):
    Wv = (rows == v0i) * (1.0 - dv) + (rows == v0i + 1) * dv
    S = jax.lax.dot_general(
        Wv.astype(jnp.bfloat16),
        img_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                # (TN, C*W) f32
    # Column interpolation on the VPU, entirely in VMEM:
    Wu = (cols == u0i) * (1.0 - du) + (cols == u0i + 1) * du
    for c in range(C):
        out_ref[c, :] = jnp.sum(S[:, c * W:(c + 1) * W] * Wu, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "C", "H", "W", "fx", "fy", "cx", "cy", "tile_n", "interpret",
    ),
)
def _warp_sample_padded(
    images_hcw: jax.Array,   # (H, C*W) bf16
    p3d: jax.Array,          # (N, 3) f32, N % tile_n == 0
    T: jax.Array,            # (4, 4) f32
    C: int, H: int, W: int,
    fx: float, fy: float, cx: float, cy: float,
    tile_n: int,
    interpret: bool = False,
):
    N = p3d.shape[0]
    grid = (N // tile_n,)
    return pl.pallas_call(
        functools.partial(_kernel, C=C, W=W, fx=fx, fy=fy, cx=cx, cy=cy),
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C * W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, N), jnp.float32),
        interpret=interpret,
    )(T, p3d, images_hcw)


# Images whose folded (H, C*W) bf16 stack would crowd VMEM (shared with the
# one-hot tap matrices and the stage-1 output) fall back to the XLA path.
VMEM_IMAGE_BYTES_MAX = 10 * 2**20


def fits_vmem(C: int, H: int, W: int) -> bool:
    return C * H * W * 2 <= VMEM_IMAGE_BYTES_MAX


def warp_and_sample(
    images: jax.Array,       # (C, H, W) f32 or bf16
    p3d: jax.Array,          # (N, 3) f32 points in the REFERENCE camera frame
    T: jax.Array,            # (4, 4) f32 pose (target <- reference)
    cam,                     # PinholeCamera (static)
    tile_n: int = TILE_N,
    interpret: bool = False,
):
    """Fused warp+project+bilinear-sample of C channels at the warped points.

    Returns ((C, N) f32 samples zeroed where invalid, (N,) bool validity:
    in front of the camera AND inside the bilinear window) — the same
    contract as projecting outside and calling bilinear_sample_dense, in one
    VMEM-resident kernel. N is padded up to a tile multiple internally
    (dummy points sit behind the camera and come back masked)."""
    C, H, W = images.shape
    N = p3d.shape[0]
    img_hcw = jnp.transpose(images, (1, 0, 2)).reshape(H, C * W)
    img_hcw = img_hcw.astype(jnp.bfloat16)
    tile = min(tile_n, 1 << max(7, (N - 1).bit_length()))
    pad = (-N) % tile
    p3d_k = jnp.pad(p3d, ((0, pad), (0, 0))) if pad else p3d
    out = _warp_sample_padded(
        img_hcw, p3d_k, T, C, H, W,
        float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
        tile, interpret,
    )
    if pad:
        out = out[:, :N]
    # Validity (elementwise, fuses into downstream residual math).
    from ..lie import se3

    p_t = se3.apply(T, p3d)
    uv = cam.project(p_t)
    u, v = uv[..., 0], uv[..., 1]
    valid = (
        (p_t[..., 2] > 1e-3)
        & (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    )
    return jnp.where(valid[None, :], out, 0.0), valid
