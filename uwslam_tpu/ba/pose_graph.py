"""Pose-graph optimization over SE(3) — loop-closure / trajectory smoothing.

The reference has no loop closure (tracking failure isn't even detected,
SURVEY.md §5); its Sim3 typedef (include/Options.h:130) signals the intended
scale-drift-aware pose-graph capability. This module supplies SE(3) pose-graph
LM (Sim(3) variant via lie.sim3 follows the same pattern):

- fixed-capacity edge table (i, j, T_ij measured, weight, valid)
- residual per edge: log(T_meas^-1 * T_i^-1 * T_j)  (6,)
- Jacobians by forward-mode autodiff through the tangent-space retraction
  (the graph is small — tens to hundreds of nodes — so one dense GN normal
  system on device beats sparse scaffolding)
- gauge: node 0 fixed.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..lie import se3
from ..utils.precision import HIGHEST


class PoseGraph(NamedTuple):
    T_wc: jax.Array      # (M, 4, 4) node poses (world <- camera)
    edge_i: jax.Array    # (E,) int32
    edge_j: jax.Array    # (E,) int32
    T_ij: jax.Array      # (E, 4, 4) measured relative transform (i <- j)
    weight: jax.Array    # (E,) scalar information weight
    valid: jax.Array     # (E,) bool


def edge_residuals(graph: PoseGraph, deltas: jax.Array) -> jax.Array:
    """Residuals (E, 6) at retracted poses T_i * exp(delta_i)."""
    T = jax.vmap(se3.compose)(graph.T_wc, se3.exp(deltas))
    Ti = T[graph.edge_i]
    Tj = T[graph.edge_j]
    rel = se3.compose(se3.inverse(Ti), Tj)               # i <- j estimated
    err = se3.compose(se3.inverse(graph.T_ij), rel)
    r = se3.log(err)
    w = jnp.sqrt(jnp.maximum(graph.weight, 0.0))
    return jnp.where(graph.valid[:, None], r * w[:, None], 0.0)


class PGOResult(NamedTuple):
    T_wc: jax.Array
    cost: jax.Array
    initial_cost: jax.Array
    iterations: jax.Array


@partial(jax.jit, static_argnames=("max_iters",))
def optimize_pose_graph(
    graph: PoseGraph,
    max_iters: int = 30,
    init_lambda: float = 1e-4,
) -> PGOResult:
    """LM on the pose graph; node 0 is the gauge anchor."""
    M = graph.T_wc.shape[0]

    def residual_flat(deltas_flat, T_wc):
        g = graph._replace(T_wc=T_wc)
        return edge_residuals(g, deltas_flat.reshape(M, 6)).reshape(-1)

    def cost_of(T_wc):
        r = residual_flat(jnp.zeros(M * 6), T_wc)
        return 0.5 * jnp.sum(r * r)

    class S(NamedTuple):
        T_wc: jax.Array
        lam: jax.Array
        cost: jax.Array
        k: jax.Array
        done: jax.Array

    def body(s: S):
        zero = jnp.zeros(M * 6)
        r = residual_flat(zero, s.T_wc)
        J = jax.jacfwd(residual_flat)(zero, s.T_wc)      # (E*6, M*6)
        H = jnp.einsum("ei,ej->ij", J, J, precision=HIGHEST)
        g = jnp.einsum("ei,e->i", J, r, precision=HIGHEST)
        # Gauge: freeze node 0.
        mask = jnp.concatenate([jnp.zeros(6), jnp.ones((M - 1) * 6)])
        H = H * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
        g = g * mask
        Hd = H + s.lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(M * 6)
        delta = -jnp.linalg.solve(Hd, g)
        T_new = jax.vmap(se3.compose)(s.T_wc, se3.exp(delta.reshape(M, 6)))
        T_new = jax.vmap(se3.normalize)(T_new)
        new_cost = cost_of(T_new)
        accept = (new_cost < s.cost) & jnp.isfinite(new_cost)
        return S(
            T_wc=jnp.where(accept, T_new, s.T_wc),
            lam=jnp.where(accept, s.lam * 0.3, s.lam * 6.0).clip(1e-9, 1e7),
            cost=jnp.where(accept, new_cost, s.cost),
            k=s.k + 1,
            done=(accept & (jnp.linalg.norm(delta) < 1e-7)) | (s.lam > 1e6),
        )

    c0 = cost_of(graph.T_wc)
    out = jax.lax.while_loop(
        lambda s: (~s.done) & (s.k < max_iters),
        body,
        S(graph.T_wc, jnp.asarray(init_lambda), c0, jnp.asarray(0),
          jnp.asarray(False)),
    )
    return PGOResult(
        T_wc=out.T_wc, cost=out.cost, initial_cost=c0, iterations=out.k
    )


class Sim3PoseGraph(NamedTuple):
    """Scale-drift-aware pose graph: nodes are Sim(3) (monocular loop closure
    must absorb accumulated scale drift — the reference's uw::Sim3 typedef at
    include/Options.h:130 signals exactly this, never realized)."""

    S_wc: jax.Array      # (M, 4, 4) Sim(3) node poses
    edge_i: jax.Array    # (E,) int32
    edge_j: jax.Array    # (E,) int32
    S_ij: jax.Array      # (E, 4, 4) measured relative Sim(3) (i <- j)
    weight: jax.Array    # (E,)
    valid: jax.Array     # (E,) bool


def sim3_edge_residuals(graph: Sim3PoseGraph, deltas: jax.Array) -> jax.Array:
    """Residuals (E, 7) at retracted poses S_i * exp(delta_i)."""
    from ..lie import sim3

    S = jax.vmap(sim3.compose)(graph.S_wc, sim3.exp(deltas))
    Si = S[graph.edge_i]
    Sj = S[graph.edge_j]
    rel = sim3.compose(sim3.inverse(Si), Sj)
    err = sim3.compose(sim3.inverse(graph.S_ij), rel)
    r = sim3.log(err)
    w = jnp.sqrt(jnp.maximum(graph.weight, 0.0))
    return jnp.where(graph.valid[:, None], r * w[:, None], 0.0)


@partial(jax.jit, static_argnames=("max_iters",))
def optimize_pose_graph_sim3(
    graph: Sim3PoseGraph,
    max_iters: int = 30,
    init_lambda: float = 1e-4,
) -> PGOResult:
    """LM on the Sim(3) pose graph; node 0 fixes gauge AND global scale."""
    from ..lie import sim3

    M = graph.S_wc.shape[0]
    D = 7

    def residual_flat(deltas_flat, S_wc):
        g = graph._replace(S_wc=S_wc)
        return sim3_edge_residuals(g, deltas_flat.reshape(M, D)).reshape(-1)

    def cost_of(S_wc):
        r = residual_flat(jnp.zeros(M * D), S_wc)
        return 0.5 * jnp.sum(r * r)

    class S(NamedTuple):
        S_wc: jax.Array
        lam: jax.Array
        cost: jax.Array
        k: jax.Array
        done: jax.Array

    def body(s: S):
        zero = jnp.zeros(M * D)
        r = residual_flat(zero, s.S_wc)
        J = jax.jacfwd(residual_flat)(zero, s.S_wc)
        H = jnp.einsum("ei,ej->ij", J, J, precision=HIGHEST)
        g = jnp.einsum("ei,e->i", J, r, precision=HIGHEST)
        mask = jnp.concatenate([jnp.zeros(D), jnp.ones((M - 1) * D)])
        H = H * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
        g = g * mask
        Hd = H + s.lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(M * D)
        delta = -jnp.linalg.solve(Hd, g)
        S_new = jax.vmap(sim3.compose)(s.S_wc, sim3.exp(delta.reshape(M, D)))
        new_cost = cost_of(S_new)
        accept = (new_cost < s.cost) & jnp.isfinite(new_cost)
        return S(
            S_wc=jnp.where(accept, S_new, s.S_wc),
            lam=jnp.where(accept, s.lam * 0.3, s.lam * 6.0).clip(1e-9, 1e7),
            cost=jnp.where(accept, new_cost, s.cost),
            k=s.k + 1,
            done=(accept & (jnp.linalg.norm(delta) < 1e-7)) | (s.lam > 1e6),
        )

    c0 = cost_of(graph.S_wc)
    out = jax.lax.while_loop(
        lambda s: (~s.done) & (s.k < max_iters),
        body,
        S(graph.S_wc, jnp.asarray(init_lambda), c0, jnp.asarray(0),
          jnp.asarray(False)),
    )
    return PGOResult(
        T_wc=out.S_wc, cost=out.cost, initial_cost=c0, iterations=out.k
    )


def odometry_edges(T_wc: jax.Array, weight: float = 1.0) -> PoseGraph:
    """Build a chain pose graph from consecutive trajectory poses."""
    M = T_wc.shape[0]
    i = jnp.arange(M - 1, dtype=jnp.int32)
    j = i + 1
    T_ij = se3.compose(se3.inverse(T_wc[i]), T_wc[j])
    return PoseGraph(
        T_wc=T_wc,
        edge_i=i,
        edge_j=j,
        T_ij=T_ij,
        weight=jnp.full((M - 1,), weight),
        valid=jnp.ones((M - 1,), bool),
    )


def add_loop_edge(
    graph: PoseGraph, i: int, j: int, T_ij: jax.Array, weight: float = 1.0
) -> PoseGraph:
    """Append one loop-closure constraint."""
    return PoseGraph(
        T_wc=graph.T_wc,
        edge_i=jnp.concatenate([graph.edge_i, jnp.asarray([i], jnp.int32)]),
        edge_j=jnp.concatenate([graph.edge_j, jnp.asarray([j], jnp.int32)]),
        T_ij=jnp.concatenate([graph.T_ij, T_ij[None]]),
        weight=jnp.concatenate([graph.weight, jnp.asarray([weight])]),
        valid=jnp.concatenate([graph.valid, jnp.asarray([True])]),
    )
