"""Image pyramids, gradients, and sampling — the per-frame preprocessing.

Capability parity with the reference's frame ingest + gradient pass:
- 5-level half-scale pyramid (cv::resize INTER_LINEAR 0.5x chain at
  /root/reference/src/System.cpp:246-251)
- Scharr x/y gradients + abs-weighted magnitude per level
  (/root/reference/src/Tracker.cpp:1127-1142)

TPU-first design: the whole pyramid + all gradients are produced by ONE jitted
function of the level-0 image; levels are a tuple of static-shape arrays so XLA
fuses the downsample/convolution chain, and everything stays device-resident
(the reference re-uploads to the GPU every frame, src/Tracker.cpp:179-180).

Images are float32 (H, W) in [0, 255] to keep residual scales comparable with
the reference's uint8 math.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

PYRAMID_LEVELS = 5  # reference: src/Options.cpp:26


class FramePyramid(NamedTuple):
    """Device-resident per-frame data. Each field is a tuple with one entry per
    pyramid level (static shapes halving per level)."""

    images: tuple[jax.Array, ...]       # (H_l, W_l) float32 intensity
    grad_x: tuple[jax.Array, ...]       # (H_l, W_l) float32 Scharr-x / 32
    grad_y: tuple[jax.Array, ...]       # (H_l, W_l) float32 Scharr-y / 32
    grad_mag: tuple[jax.Array, ...]     # 0.5*(|gx|+|gy|), reference's gradient_

    @property
    def levels(self) -> int:
        return len(self.images)


def downsample2x(image: jax.Array) -> jax.Array:
    """2x2 area-mean downsample (matches cv::resize INTER_LINEAR at exactly
    0.5x, which degenerates to 2x2 averaging)."""
    H, W = image.shape
    return image.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))


# Scharr is separable: [-3 0 3; -10 0 10; -3 0 3] = [3 10 3]^T x [-1 0 1].
# Implemented as padded slicing (pure VPU adds/muls — measured ~2x faster on
# v5e than conv_general_dilated for single-channel images). Normalized by 1/32
# so gradient units are intensity/pixel (cv::Scharr is unnormalized; the
# reference only uses relative magnitudes, so this is documented, not
# behavioral).


def _smooth_310(x: jax.Array, axis: int) -> jax.Array:
    """[3, 10, 3]/16 smoothing along axis with edge replication."""
    pad = [(0, 0), (0, 0)]
    pad[axis] = (1, 1)
    p = jnp.pad(x, pad, mode="edge")
    if axis == 0:
        return (3.0 * p[:-2, :] + 10.0 * p[1:-1, :] + 3.0 * p[2:, :]) / 16.0
    return (3.0 * p[:, :-2] + 10.0 * p[:, 1:-1] + 3.0 * p[:, 2:]) / 16.0


def _central_diff(x: jax.Array, axis: int) -> jax.Array:
    """[-1, 0, 1]/2 central difference along axis with edge replication."""
    pad = [(0, 0), (0, 0)]
    pad[axis] = (1, 1)
    p = jnp.pad(x, pad, mode="edge")
    if axis == 0:
        return (p[2:, :] - p[:-2, :]) * 0.5
    return (p[:, 2:] - p[:, :-2]) * 0.5


def scharr_gradients(image: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Scharr x/y derivatives of one level (reference src/Tracker.cpp:1133-1138).

    Direct 9-tap form off ONE edge-padded buffer (both gradients share every
    tap load, and XLA fuses the whole thing into a single elementwise pass):
    measured 1.87 vs 2.63 ms for the single-frame 3-level pyramid on v5e
    against the two-stage separable form, bit-identical to 2e-5."""
    p = jnp.pad(image, ((1, 1), (1, 1)), mode="edge")
    a = p[:-2, :-2]
    b = p[:-2, 1:-1]
    c = p[:-2, 2:]
    d = p[1:-1, :-2]
    f = p[1:-1, 2:]
    g = p[2:, :-2]
    h = p[2:, 1:-1]
    i = p[2:, 2:]
    gx = (3.0 * (c - a) + 10.0 * (f - d) + 3.0 * (i - g)) * (1.0 / 32.0)
    gy = (3.0 * (g - a) + 10.0 * (h - b) + 3.0 * (i - c)) * (1.0 / 32.0)
    return gx, gy


@partial(jax.jit, static_argnames=("levels",))
def build_pyramid(image: jax.Array, levels: int = PYRAMID_LEVELS) -> FramePyramid:
    """Level-0 image (H, W) float32 -> full pyramid with gradients, one fused
    XLA program. H and W must be divisible by 2^(levels-1)."""
    images = [image]
    for _ in range(levels - 1):
        images.append(downsample2x(images[-1]))
    gxs, gys, gms = [], [], []
    for img in images:
        gx, gy = scharr_gradients(img)
        gxs.append(gx)
        gys.append(gy)
        # reference: gradient_ = 0.5|gx| + 0.5|gy| (addWeighted at :1141)
        gms.append(0.5 * jnp.abs(gx) + 0.5 * jnp.abs(gy))
    return FramePyramid(
        images=tuple(images),
        grad_x=tuple(gxs),
        grad_y=tuple(gys),
        grad_mag=tuple(gms),
    )


@partial(jax.jit, static_argnames=("levels",))
def build_pyramid_batched(
    images: jax.Array, levels: int = PYRAMID_LEVELS
) -> FramePyramid:
    """Batched pyramid build: (B, H, W) -> FramePyramid of (B, H_l, W_l)
    levels. On TPU with a real batch, the per-level gradient pass runs the
    fused Pallas kernel (ops.pallas_pyramid: one VMEM-resident pass per
    frame produces gx/gy/|g|; 6.55 -> 4.31 ms for the 5-level b96 chunk,
    bit-exact); otherwise identical math to vmap(build_pyramid)."""
    from ..ops.pallas_pyramid import scharr_gradients_batched, use_pallas_scharr

    B = images.shape[0]
    imgs = [images]
    for _ in range(levels - 1):
        b, h, w = imgs[-1].shape
        imgs.append(imgs[-1].reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4)))
    gxs, gys, gms = [], [], []
    for im in imgs:
        _, H, W = im.shape
        if use_pallas_scharr(B, H, W):
            gx, gy, gm = scharr_gradients_batched(im)
        else:
            gx, gy = jax.vmap(scharr_gradients)(im)
            gm = 0.5 * jnp.abs(gx) + 0.5 * jnp.abs(gy)
        gxs.append(gx)
        gys.append(gy)
        gms.append(gm)
    return FramePyramid(
        images=tuple(imgs),
        grad_x=tuple(gxs),
        grad_y=tuple(gys),
        grad_mag=tuple(gms),
    )


@partial(jax.jit, static_argnames=("levels",))
def build_depth_pyramid(depth: jax.Array, levels: int = PYRAMID_LEVELS):
    """Depth pyramid via min-pooling-aware mean: zeros (invalid) are excluded
    from the average so borders of missing depth don't bleed.

    The reference naively cv::resizes depth (src/System.cpp:249-250); we keep
    shape parity but fix the invalid-bleed, documented divergence."""
    depths = [depth]
    for _ in range(levels - 1):
        d = depths[-1]
        H, W = d.shape
        blocks = d.reshape(H // 2, 2, W // 2, 2)
        valid = (blocks > 0).astype(d.dtype)
        num = (blocks * valid).sum(axis=(1, 3))
        den = valid.sum(axis=(1, 3))
        depths.append(jnp.where(den > 0, num / jnp.maximum(den, 1), 0.0))
    return tuple(depths)


def bilinear_sample_dense(images: jax.Array, uv: jax.Array, precision=None):
    """Bilinear sampling as two dense matmuls — the MXU replacement for
    scattered gathers (TPU gathers serialize; a one-hot contraction runs at
    matrix-unit speed).

    images: (C, H, W) channel stack; uv: (N, 2). Returns ((C, N), valid (N,)).

    sample[c, n] = sum_h sum_w Wv[n, h] * images[c, h, w] * Wu[n, w]
    where Wv/Wu have the two bilinear taps per row. Cost O(N*H*W) MACs —
    dominated by the (N, H) x (C, H, W) contraction, which XLA maps onto the
    MXU; for 2048 points on 640x480 this is ~0.6 GMAC/channel, microseconds
    on a v5e. Out-of-bounds rows produce all-zero weights (fill = 0).
    """
    C, H, W = images.shape
    u, v = uv[..., 0], uv[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = (u - u0)[:, None]
    dv = (v - v0)[:, None]
    rows = jax.lax.broadcasted_iota(jnp.float32, (1, H), 1)
    cols = jax.lax.broadcasted_iota(jnp.float32, (1, W), 1)
    # Two taps per row: weight (1-dv) at v0, dv at v0+1 (same for u).
    Wv = (rows == v0[:, None]) * (1.0 - dv) + (rows == v0[:, None] + 1.0) * dv
    Wu = (cols == u0[:, None]) * (1.0 - du) + (cols == u0[:, None] + 1.0) * du
    # The heavy (N, H) x (C, H, W) contraction runs on the MXU; bf16
    # operands with f32 accumulation double its peak there. Round-4
    # re-measurement (IC offline chunk, head-to-head in one session):
    # 2856 -> 3168 fps at IDENTICAL ATE to 5 decimals — the bf16
    # quantization of one-hot weights (exactly representable) and [0,255]
    # intensities (~0.25 ADU, far under the sensor noise) does not move the
    # pose. Callers that sample value-critical data (16-bit depth) pass an
    # explicit precision and keep the f32 path; UWSLAM_SAMPLE_F32=1 forces
    # it globally. (An earlier round measured bf16 as a wash on the FC
    # 3-channel path and worse accuracy with bf16 GRADIENTS feeding J;
    # FC's residuals_and_jacobian therefore passes precision=HIGHEST so its
    # gradient channels never take this branch — only IC's intensity-only
    # sampling and gradient-free callers narrow to bf16.)
    import os as _os

    if (
        precision is None
        and jax.default_backend() == "tpu"
        and not _os.environ.get("UWSLAM_SAMPLE_F32")
    ):
        S = jnp.einsum(
            "nh,chw->cnw",
            Wv.astype(jnp.bfloat16),
            images.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    else:
        S = jnp.einsum("nh,chw->cnw", Wv, images,
                       preferred_element_type=jnp.float32,
                       precision=precision)
    out = jnp.einsum("cnw,nw->cn", S, Wu,
                     preferred_element_type=jnp.float32, precision=precision)
    valid = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    return jnp.where(valid[None, :], out, 0.0), valid


def bilinear_sample_auto(
    image: jax.Array, uv: jax.Array, fill: float = 0.0, precision=None
):
    """Backend-dispatching bilinear sampling for (N, 2) point sets.

    On TPU, scattered point gathers serialize badly — measured 16.6 ms for
    96x2048 batched bilinear gathers on v5e where the dense one-hot matmul
    formulation takes 0.78 ms (21x) — so this routes to
    `bilinear_sample_dense`. On CPU the O(N*H*W) contraction would be the
    disaster instead, so the 4-tap gather stays. Pass
    precision=jax.lax.Precision.HIGHEST for data where bf16 MXU truncation
    of the *values* matters (e.g. 16-bit depth maps); intensity tracking is
    robust to it.
    """
    if jax.default_backend() == "cpu" or uv.ndim != 2:
        return bilinear_sample(image, uv, fill=fill)
    out, valid = bilinear_sample_dense(image[None], uv, precision=precision)
    out = out[0]
    if fill != 0.0:
        out = jnp.where(valid, out, fill)
    return out, valid


def bilinear_sample(image: jax.Array, uv: jax.Array, fill: float = 0.0):
    """Bilinear interpolation at subpixel coords: image (H, W), uv (..., 2).

    The reference rounds to nearest (src/Tracker.cpp:746); bilinear is a
    documented accuracy improvement (SURVEY.md §7.3)."""
    H, W = image.shape
    u, v = uv[..., 0], uv[..., 1]
    u0 = jnp.floor(u); v0 = jnp.floor(v)
    du = u - u0; dv = v - v0
    u0i = jnp.clip(u0.astype(jnp.int32), 0, W - 2)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, H - 2)
    i00 = image[v0i, u0i]
    i01 = image[v0i, u0i + 1]
    i10 = image[v0i + 1, u0i]
    i11 = image[v0i + 1, u0i + 1]
    out = (
        i00 * (1 - du) * (1 - dv)
        + i01 * du * (1 - dv)
        + i10 * (1 - du) * dv
        + i11 * du * dv
    )
    valid = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    return jnp.where(valid, out, fill), valid
