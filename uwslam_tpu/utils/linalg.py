"""Small-matrix linear algebra that stays on the VPU.

jnp.linalg.{eigh, svd} on TPU lower to the EighTpu custom call — a
Jacobi-rotation loop that cannot fuse and costs milliseconds even for
batched 2x2/5x5 problems (measured in the boot megastep: 3.8 ms for 256
hypothesis SVDs + 2.2 ms for 768 triangulation eighs per frame). Every
decomposition the per-frame path needs is tiny (n <= 9) and has either a
closed form or a fast fixed-point iteration, so this module provides
fusable, batch-broadcasting replacements:

- cholesky_solve_unrolled: statically-unrolled SPD solve (any small n)
- smallest_eigvec_spd: inverse-power iteration (smallest eigenvector)
- sym3_eigh: closed-form symmetric 3x3 eigendecomposition (Cardano)
- svd3: 3x3 SVD built on sym3_eigh

All support leading batch dims and never leave XLA fusion land.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cholesky_solve_unrolled(A: jax.Array, b: jax.Array) -> jax.Array:
    """Solve the small SPD system A x = b via a statically-unrolled
    Cholesky (n = A.shape[-1]); broadcasts over leading batch dims.

    jnp.linalg.solve lowers to an LU custom call that cannot fuse (~4 ms
    per 95-pair tracking chunk on v5e); this unrolled form is pure
    elementwise math that XLA folds into the surrounding fusion. A must
    be (numerically) SPD — add a ridge before calling if unsure."""
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def smallest_eigvec_spd(A: jax.Array, iters: int = 10) -> jax.Array:
    """Unit eigenvector of the smallest eigenvalue of a small symmetric
    PSD matrix (..., n, n) via inverse-power iteration.

    Each step solves (A + eps*tr(A)*I) x = x_prev with the unrolled
    Cholesky and renormalizes — everything fuses. Convergence is geometric
    in lambda_min/lambda_2; for least-squares null-vector extraction
    (8-point F, DLT triangulation) the gap is healthy and `iters`=10 is
    far past f32 resolution. With a (near-)degenerate smallest pair the
    result lands in their span — exactly what an LS consumer wants."""
    n = A.shape[-1]
    tr = jnp.trace(A, axis1=-2, axis2=-1)[..., None, None]
    ridge = 1e-7 * tr + 1e-30
    Ar = A + ridge * jnp.eye(n, dtype=A.dtype)
    # Deterministic start with components along every axis.
    x = jnp.ones(A.shape[:-2] + (n,), A.dtype) + 1e-2 * jnp.arange(
        n, dtype=A.dtype
    )
    for _ in range(iters):
        x = cholesky_solve_unrolled(Ar, x)
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-30)
    return x


def sym3_eigh(A: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Closed-form eigendecomposition of a symmetric 3x3 (..., 3, 3).

    Returns (w, V) with eigenvalues ASCENDING (jnp.linalg.eigh order) and
    V[..., :, i] the unit eigenvector of w[..., i]. Eigenvalues by the
    trigonometric (Cardano) formula; eigenvectors by cross products of
    the two best-conditioned rows of (A - w I), with a robust fallback
    through orthogonalization for (near-)repeated eigenvalues."""
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    B = A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detB = jnp.linalg.det(B)
    r = jnp.clip(detB / (2.0 * p**3).clip(1e-30), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # w0 >= w1 >= w2 by construction of the cosine branches.
    w0 = q + 2.0 * p * jnp.cos(phi)
    w2 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    w1 = 3.0 * q - w0 - w2
    w_desc = jnp.stack([w0, w1, w2], axis=-1)

    def eigvec(w):
        M = A - w[..., None, None] * jnp.eye(3, dtype=A.dtype)
        r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
        c01 = jnp.cross(r0, r1)
        c12 = jnp.cross(r1, r2)
        c20 = jnp.cross(r2, r0)
        n01 = jnp.sum(c01 * c01, axis=-1, keepdims=True)
        n12 = jnp.sum(c12 * c12, axis=-1, keepdims=True)
        n20 = jnp.sum(c20 * c20, axis=-1, keepdims=True)
        best = jnp.where(
            n01 >= jnp.maximum(n12, n20), c01,
            jnp.where(n12 >= n20, c12, c20),
        )
        nb = jnp.maximum(n01, jnp.maximum(n12, n20))
        return best / jnp.sqrt(nb.clip(1e-30)), nb[..., 0]

    v0, q0 = eigvec(w0)
    v2, q2 = eigvec(w2)
    # Pick the better-conditioned pair first, complete with orthogonality:
    # repeated-eigenvalue planes make one cross-product degenerate, never
    # both extremes at once (a fully degenerate A = c*I has any basis).
    v2 = v2 - jnp.sum(v2 * v0, axis=-1, keepdims=True) * v0
    n2 = jnp.linalg.norm(v2, axis=-1, keepdims=True)
    # Fallback for v2 collapsing onto v0: any vector orthogonal to v0.
    alt = jnp.cross(v0, jnp.stack(
        [jnp.ones_like(q0), jnp.zeros_like(q0), jnp.zeros_like(q0)], axis=-1
    ))
    alt2 = jnp.cross(v0, jnp.stack(
        [jnp.zeros_like(q0), jnp.ones_like(q0), jnp.zeros_like(q0)], axis=-1
    ))
    altn = jnp.linalg.norm(alt, axis=-1, keepdims=True)
    alt = jnp.where(altn > 0.1, alt / altn.clip(1e-30),
                    alt2 / jnp.linalg.norm(alt2, axis=-1, keepdims=True
                                           ).clip(1e-30))
    v2 = jnp.where(n2 > 1e-6, v2 / n2.clip(1e-30), alt)
    v1 = jnp.cross(v2, v0)
    V_desc = jnp.stack([v0, v1, v2], axis=-1)
    # Ascending order to match jnp.linalg.eigh.
    w_asc = w_desc[..., ::-1]
    V_asc = V_desc[..., ::-1]
    return w_asc, V_asc


def svd3(F: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """SVD of a 3x3 (..., 3, 3): returns (U, s, Vt) with s DESCENDING
    (jnp.linalg.svd order) and U/Vt proper up to per-column signs.

    V from the closed-form eigendecomposition of F^T F; U_i = F v_i / s_i
    for the two leading columns, completed by their cross product (exact
    for the rank-2 matrices this framework decomposes — E and F — and
    correct for full-rank inputs up to the sign conventions SVD leaves
    free anyway)."""
    FtF = jnp.einsum("...ji,...jk->...ik", F, F)
    w, V = sym3_eigh(FtF)            # ascending
    s = jnp.sqrt(jnp.clip(w[..., ::-1], 0.0, None))   # descending
    Vd = V[..., ::-1]                # columns by descending singular value
    u0 = jnp.einsum("...ij,...j->...i", F, Vd[..., :, 0])
    u1 = jnp.einsum("...ij,...j->...i", F, Vd[..., :, 1])
    u0 = u0 / jnp.linalg.norm(u0, axis=-1, keepdims=True).clip(1e-30)
    u1 = u1 - jnp.sum(u1 * u0, axis=-1, keepdims=True) * u0
    u1 = u1 / jnp.linalg.norm(u1, axis=-1, keepdims=True).clip(1e-30)
    u2 = jnp.cross(u0, u1)
    # Align u2 with F v2 so full-rank inputs reconstruct (for rank-2 the
    # sign is free, as in any SVD).
    d = jnp.sum(u2 * jnp.einsum("...ij,...j->...i", F, Vd[..., :, 2]),
                axis=-1, keepdims=True)
    u2 = u2 * jnp.where(d < 0, -1.0, 1.0)
    U = jnp.stack([u0, u1, u2], axis=-1)
    return U, s, jnp.swapaxes(Vd, -2, -1)
