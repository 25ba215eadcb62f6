"""Pose-graph optimization on SE(3) — batched Levenberg-Marquardt.

TPU-native replacement for the reference's g2o pose graph
(loopClosureOnCovGraphG2ONew, /root/reference/src/backend/
vo_loopclosing.cpp:742-944): VertexSE3 nodes for every keyframe, sequential
EdgeSE3 constraints to the next 5 successors with a Cauchy robust kernel,
loop-closure edges, optimize(100).

Design: fixed-capacity node/edge arrays with validity masks.  Edge residual
r = log(T_meas⁻¹ · T_i⁻¹ · T_j) ∈ ℝ⁶ with exact Jacobians from forward-mode
autodiff, vmapped over all edges at once; the normal system is scatter-added
into a dense (6K, 6K) matrix (K ≤ a few hundred keyframes participate in any
reference PGO — the window is [first loop id, last loop id]) and solved with
one Cholesky.  Cauchy weights match the reference's kernel choice.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..geometry import se3 as se3m, so3
from ..geometry.se3 import SE3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PoseGraph:
    """Nodes are world-from-camera poses T_w_c (VertexSE3 convention)."""

    node_q: jax.Array      # (K, 4)
    node_t: jax.Array      # (K, 3)
    node_valid: jax.Array  # (K,) bool
    edge_i: jax.Array      # (E,) i32 source node
    edge_j: jax.Array      # (E,) i32 target node
    edge_q: jax.Array      # (E, 4) measured T_i_j = T_wi⁻¹ T_wj
    edge_t: jax.Array      # (E, 3)
    edge_valid: jax.Array  # (E,) bool
    edge_weight: jax.Array  # (E,) information scale (loop edges can be upweighted)

    @property
    def num_nodes(self):
        return self.node_q.shape[0]


def empty(max_nodes: int, max_edges: int, dtype=jnp.float32) -> PoseGraph:
    return PoseGraph(
        node_q=jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype), (max_nodes, 1)),
        node_t=jnp.zeros((max_nodes, 3), dtype),
        node_valid=jnp.zeros(max_nodes, bool),
        edge_i=jnp.zeros(max_edges, jnp.int32),
        edge_j=jnp.zeros(max_edges, jnp.int32),
        edge_q=jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype), (max_edges, 1)),
        edge_t=jnp.zeros((max_edges, 3), dtype),
        edge_valid=jnp.zeros(max_edges, bool),
        edge_weight=jnp.ones(max_edges, dtype),
    )


def _edge_residual(xi_i, xi_j, Ti: SE3, Tj: SE3, Tij: SE3):
    """r = log(Tij⁻¹ · (Ti·exp(ξi))⁻¹ · (Tj·exp(ξj)))."""
    Ti_p = se3m.compose(Ti, se3m.exp(xi_i))
    Tj_p = se3m.compose(Tj, se3m.exp(xi_j))
    rel = se3m.compose(se3m.inverse(Ti_p), Tj_p)
    return se3m.log(se3m.compose(se3m.inverse(Tij), rel))


def _edge_res_jac(Ti: SE3, Tj: SE3, Tij: SE3):
    z = jnp.zeros(6, Ti.t.dtype)
    r = _edge_residual(z, z, Ti, Tj, Tij)
    Ji = jax.jacfwd(_edge_residual, argnums=0)(z, z, Ti, Tj, Tij)
    Jj = jax.jacfwd(_edge_residual, argnums=1)(z, z, Ti, Tj, Tij)
    return r, Ji, Jj


def _cauchy_weight(r2, c: float):
    return 1.0 / (1.0 + r2 / (c * c))


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize(graph: PoseGraph, fixed_mask, iters: int = 20, cauchy_c: float = 1.0,
             lam0: float = 1e-4):
    """Run LM on the pose graph.  fixed_mask: (K,) bool nodes held constant
    (the reference fixes the first loop keyframe).  Returns updated graph."""
    K = graph.num_nodes
    Ti_all = SE3(graph.node_q, graph.node_t)

    def total_cost(nodes: SE3):
        Ti = se3m.index(nodes, graph.edge_i)
        Tj = se3m.index(nodes, graph.edge_j)
        Tij = SE3(graph.edge_q, graph.edge_t)
        z = jnp.zeros((graph.edge_i.shape[0], 6), nodes.t.dtype)
        r = jax.vmap(_edge_residual)(z, z, Ti, Tj, Tij)
        r2 = jnp.sum(r * r, axis=-1)
        rho = (cauchy_c ** 2) * jnp.log1p(r2 / cauchy_c ** 2)
        return jnp.sum(jnp.where(graph.edge_valid, rho * graph.edge_weight, 0.0))

    def lm_step(nodes: SE3, lam):
        Ti = se3m.index(nodes, graph.edge_i)
        Tj = se3m.index(nodes, graph.edge_j)
        Tij = SE3(graph.edge_q, graph.edge_t)
        r, Ji, Jj = jax.vmap(_edge_res_jac)(Ti, Tj, Tij)      # (E,6), (E,6,6)×2
        r2 = jnp.sum(r * r, axis=-1)
        w = _cauchy_weight(r2, cauchy_c) * graph.edge_weight
        w = jnp.where(graph.edge_valid, w, 0.0)

        # Assemble dense H (6K, 6K) and b (6K) by scatter-add of edge blocks.
        H = jnp.zeros((K, K, 6, 6))
        b = jnp.zeros((K, 6))
        JiW = Ji * w[:, None, None]
        JjW = Jj * w[:, None, None]
        ii = graph.edge_i
        jj = graph.edge_j
        H = H.at[ii, ii].add(jnp.einsum("eki,ekj->eij", JiW, Ji, precision="highest"))
        H = H.at[jj, jj].add(jnp.einsum("eki,ekj->eij", JjW, Jj, precision="highest"))
        H = H.at[ii, jj].add(jnp.einsum("eki,ekj->eij", JiW, Jj, precision="highest"))
        H = H.at[jj, ii].add(jnp.einsum("eki,ekj->eij", JjW, Ji, precision="highest"))
        b = b.at[ii].add(-jnp.einsum("eki,ek->ei", JiW, r, precision="highest"))
        b = b.at[jj].add(-jnp.einsum("eki,ek->ei", JjW, r, precision="highest"))

        Hd = H.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
        fix = jnp.repeat(fixed_mask | ~graph.node_valid, 6)
        Hd = jnp.where(fix[:, None] | fix[None, :], 0.0, Hd)
        diag = jnp.diag(Hd)
        Hd = Hd + jnp.diag(jnp.where(fix, 1.0, lam * jnp.maximum(diag, 1e-6) + 1e-9))
        bv = jnp.where(fix, 0.0, b.reshape(-1))
        dx = jnp.linalg.solve(Hd, bv).reshape(K, 6)
        return se3m.compose(nodes, se3m.exp(dx))

    def body(_, carry):
        nodes, lam, cost = carry
        new_nodes = lm_step(nodes, lam)
        new_cost = total_cost(new_nodes)
        better = new_cost < cost
        nodes = jax.tree.map(lambda a, b_: jnp.where(better, b_, a), nodes, new_nodes)
        lam = jnp.where(better, jnp.maximum(lam * 0.3, 1e-8), jnp.minimum(lam * 6.0, 1e4))
        cost = jnp.where(better, new_cost, cost)
        return nodes, lam, cost

    nodes, _, cost = jax.lax.fori_loop(
        0, iters, body, (Ti_all, jnp.asarray(lam0), total_cost(Ti_all))
    )
    return dataclasses.replace(graph, node_q=nodes.q, node_t=nodes.t), cost
