"""Matmul precision helpers.

On TPU the default matmul precision is bfloat16; geometry math (Lie algebra,
3x3/4x4 composes, normal equations) needs full f32 MXU passes or it loses
~3 decimal digits per product (observed: 1e-2 orthogonality error in a single
Rodrigues W@W on v5e). These helpers pin HIGHEST precision; the FLOP cost is
negligible for small matrices, and bulk kernels that tolerate bf16 (e.g.
descriptor matching) opt in to default precision explicitly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def mm(a: jax.Array, b: jax.Array) -> jax.Array:
    """Full-precision matmul for geometry-sized operands."""
    return jnp.matmul(a, b, precision=HIGHEST)


def einsum(subscripts: str, *operands: jax.Array) -> jax.Array:
    """Full-precision einsum."""
    return jnp.einsum(subscripts, *operands, precision=HIGHEST)
