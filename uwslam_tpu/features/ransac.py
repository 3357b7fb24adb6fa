"""Masked, vmapped RANSAC for fundamental/essential matrices.

Mirrors the reference's geometric verification
(/root/reference/src/Tracker.cpp:105-169: findFundamentalMat RANSAC, distance
3.0 px, confidence 0.99, optional 8-point refit on inliers) and the standalone
five-point essential pipeline (src/feature_detector.cpp:262-269) — TPU-first:

- a FIXED batch of hypotheses evaluated in parallel with vmap (no sequential
  adaptive termination: the hypothesis batch is sized for the 0.99-confidence
  worst case up front, so control flow is static);
- each hypothesis is a Hartley-normalized 8-point solve; the batched SVDs and
  the Sampson-distance inlier counts are dense linear algebra XLA maps well;
- invalid matches are masked out of sampling (Gumbel top-k over the validity
  mask) and of inlier counts.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.precision import HIGHEST

RANSAC_THRESH_PX = 3.0   # reference src/Tracker.cpp:150
NUM_HYPOTHESES = 256     # > log(1-0.99)/log(1-0.5^8) ≈ 1177 for 50% outliers;
                         # 256 covers ~35% outliers, post-ratio-test typical


class RansacResult(NamedTuple):
    F: jax.Array           # (3, 3) best model (fundamental or essential)
    inliers: jax.Array     # (K,) bool
    num_inliers: jax.Array
    ok: jax.Array          # bool: enough inliers found


def _normalize_points(uv: jax.Array, valid: jax.Array):
    """Hartley normalization: zero-mean, mean distance sqrt(2)."""
    w = valid.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    mean = (uv * w[:, None]).sum(0) / n
    d = jnp.linalg.norm(uv - mean, axis=-1)
    scale = jnp.sqrt(2.0) / jnp.maximum((d * w).sum() / n, 1e-6)
    T = jnp.array(
        [
            [scale, 0.0, -scale * mean[0]],
            [0.0, scale, -scale * mean[1]],
            [0.0, 0.0, 1.0],
        ],
        dtype=jnp.float32,
    )
    return (uv - mean) * scale, T


def _eight_point(pa: jax.Array, pb: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted 8-point: rows w_i * [xb*xa, xb*ya, xb, yb*xa, yb*ya, yb, xa, ya, 1].

    pa/pb: (M, 2) normalized coords, w: (M,) weights. Returns (3, 3) F with
    rank-2 enforcement."""
    xa, ya = pa[:, 0], pa[:, 1]
    xb, yb = pb[:, 0], pb[:, 1]
    one = jnp.ones_like(xa)
    A = jnp.stack(
        [xb * xa, xb * ya, xb, yb * xa, yb * ya, yb, xa, ya, one], axis=-1
    ) * w[:, None]
    # min |Af|: eigenvector of A^T A with smallest eigenvalue.
    AtA = jnp.einsum("mi,mj->ij", A, A, precision=HIGHEST)
    _, V = jnp.linalg.eigh(AtA)
    f = V[:, 0]
    F = f.reshape(3, 3)
    # Rank-2 enforcement.
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    return (U * S[None, :]) @ Vt


def sampson_distance(F: jax.Array, uv_a: jax.Array, uv_b: jax.Array):
    """First-order geometric (Sampson) distance per correspondence (K,)."""
    ones = jnp.ones_like(uv_a[:, :1])
    xa = jnp.concatenate([uv_a, ones], axis=-1)  # (K, 3)
    xb = jnp.concatenate([uv_b, ones], axis=-1)
    Fxa = xa @ F.T  # rows are (F @ xa): the epipolar line in image b
    Ftxb = xb @ F   # rows F^T xb
    num = jnp.sum(xb * Fxa, axis=-1) ** 2
    den = Fxa[:, 0] ** 2 + Fxa[:, 1] ** 2 + Ftxb[:, 0] ** 2 + Ftxb[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


@partial(jax.jit, static_argnames=("num_hypotheses", "min_inliers"))
def fundamental_ransac(
    uv_a: jax.Array,
    uv_b: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    threshold: float = RANSAC_THRESH_PX,
    num_hypotheses: int = NUM_HYPOTHESES,
    min_inliers: int = 15,
) -> RansacResult:
    """RANSAC fundamental matrix with final inlier refit.

    uv_a/uv_b: (K, 2) matched pixel coords; valid: (K,) mask."""
    K = uv_a.shape[0]
    pa_n, Ta = _normalize_points(uv_a, valid)
    pb_n, Tb = _normalize_points(uv_b, valid)

    # Sample 8 valid indices per hypothesis: Gumbel top-k over the mask.
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(key, (num_hypotheses, K), minval=1e-9, maxval=1.0)
    ))
    scores = jnp.where(valid[None, :], gumbel, -jnp.inf)
    _, sample_idx = jax.lax.top_k(scores, 8)  # (H, 8)

    def solve_one(idx):
        return _eight_point(pa_n[idx], pb_n[idx], jnp.ones((8,)))

    Fs_n = jax.vmap(solve_one)(sample_idx)  # (H, 3, 3) in normalized coords

    # Denormalize: F = Tb^T Fn Ta ; Sampson threshold applies in pixels.
    Fs = jnp.einsum("ji,hjk,kl->hil", Tb, Fs_n, Ta, precision=HIGHEST)

    def count_inliers(F):
        d = sampson_distance(F, uv_a, uv_b)
        inl = valid & (d < threshold * threshold)
        return inl, inl.sum()

    inls, counts = jax.vmap(count_inliers)(Fs)
    best = jnp.argmax(counts)
    best_inliers = inls[best]

    # Refit on all inliers (reference's 8-point refine stage :158-166).
    w = best_inliers.astype(jnp.float32)
    F_refit_n = _eight_point(pa_n, pb_n, w)
    F_refit = Tb.T @ F_refit_n @ Ta
    d = sampson_distance(F_refit, uv_a, uv_b)
    refit_inliers = valid & (d < threshold * threshold)
    use_refit = refit_inliers.sum() >= counts[best]
    F_final = jnp.where(use_refit, F_refit, Fs[best])
    inliers = jnp.where(use_refit, refit_inliers, best_inliers)
    n = inliers.sum()
    return RansacResult(
        F=F_final / jnp.maximum(jnp.abs(F_final[2, 2]), 1e-12),
        inliers=inliers,
        num_inliers=n,
        ok=n >= min_inliers,
    )


@partial(jax.jit, static_argnames=("num_hypotheses", "min_inliers"))
def essential_ransac(
    xy_a: jax.Array,
    xy_b: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    threshold_norm: float = 3.0 / 500.0,
    num_hypotheses: int = NUM_HYPOTHESES,
    min_inliers: int = 15,
) -> RansacResult:
    """Essential matrix RANSAC on NORMALIZED camera coords (x, y) = K^-1 u.

    Uses the 8-point solver with the essential constraint enforced by
    projecting singular values to (s, s, 0) (the reference's five-point
    cv::findEssentialMat at src/feature_detector.cpp:262-265 serves the same
    role; 8-point on normalized coords is SVD-batched and TPU-regular)."""
    res = fundamental_ransac(
        xy_a, xy_b, valid, key,
        threshold=threshold_norm,
        num_hypotheses=num_hypotheses,
        min_inliers=min_inliers,
    )
    U, S, Vt = jnp.linalg.svd(res.F)
    s = 0.5 * (S[0] + S[1])
    E = (U * jnp.array([s, s, 0.0])[None, :]) @ Vt
    return RansacResult(F=E, inliers=res.inliers,
                        num_inliers=res.num_inliers, ok=res.ok)
