"""Pose-graph optimization: drift correction on a synthetic loop."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from flvis_tpu.geometry import se3, so3
from flvis_tpu.loop import pose_graph


def circle_poses(n, radius=5.0):
    """Ground-truth T_w_c for a camera moving on a circle, yawing along it."""
    poses = []
    for i in range(n):
        th = 2 * np.pi * i / n
        C = np.array([radius * np.cos(th), radius * np.sin(th), 0.0])
        q = so3.exp(jnp.asarray([0.0, 0.0, th]))
        poses.append(se3.SE3(q, jnp.asarray(C, jnp.float32)))
    return poses


def build_drifted_graph(n=24, drift_per_step=0.02, rng=None):
    gt = circle_poses(n)
    # Odometry: relative GT motions with an accumulating translation bias.
    g = pose_graph.empty(n, 4 * n)
    node_q, node_t = [], []
    cur = gt[0]
    ei, ej, eq, et, ev, ew = [], [], [], [], [], []
    for i in range(n):
        node_q.append(cur.q)
        node_t.append(cur.t)
        if i + 1 < n:
            rel = se3.compose(se3.inverse(gt[i]), gt[i + 1])
            rel_drift = se3.SE3(rel.q, rel.t + drift_per_step)  # biased odometry
            ei.append(i); ej.append(i + 1)
            eq.append(rel_drift.q); et.append(rel_drift.t)
            ev.append(True); ew.append(1.0)
            cur = se3.compose(cur, rel_drift)
    # Loop edge: node n-1 → node 0 with the TRUE relative pose.
    rel_loop = se3.compose(se3.inverse(gt[n - 1]), gt[0])
    ei.append(n - 1); ej.append(0)
    eq.append(rel_loop.q); et.append(rel_loop.t)
    ev.append(True); ew.append(5.0)

    E = g.edge_i.shape[0]
    pad = E - len(ei)
    g = dataclasses.replace(
        g,
        node_q=jnp.stack(node_q), node_t=jnp.stack(node_t),
        node_valid=jnp.ones(n, bool),
        edge_i=jnp.asarray(ei + [0] * pad, jnp.int32),
        edge_j=jnp.asarray(ej + [0] * pad, jnp.int32),
        edge_q=jnp.concatenate([jnp.stack(eq), jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (pad, 1))]),
        edge_t=jnp.concatenate([jnp.stack(et), jnp.zeros((pad, 3))]),
        edge_valid=jnp.asarray(ev + [False] * pad),
        edge_weight=jnp.asarray(ew + [1.0] * pad, jnp.float32),
    )
    return g, gt


class TestPoseGraph:
    def test_closes_loop(self):
        g, gt = build_drifted_graph()
        n = len(gt)
        # Before: accumulated drift at the last node.
        drift_before = float(jnp.linalg.norm(g.node_t[n - 1] - gt[n - 1].t))
        assert drift_before > 0.3
        fixed = jnp.zeros(n, bool).at[0].set(True)
        g2, cost = pose_graph.optimize(g, fixed, iters=25)
        errs = [float(jnp.linalg.norm(g2.node_t[i] - gt[i].t)) for i in range(n)]
        # Drift should be largely absorbed (odometry bias spreads across the
        # loop, so poses won't be exact — but the endpoint must snap back).
        assert max(errs) < drift_before * 0.6, (max(errs), drift_before)
        end_err = errs[n - 1]
        assert end_err < 0.08, end_err

    def test_fixed_node_unmoved(self):
        g, gt = build_drifted_graph()
        fixed = jnp.zeros(len(gt), bool).at[0].set(True)
        g2, _ = pose_graph.optimize(g, fixed, iters=10)
        np.testing.assert_allclose(g2.node_t[0], g.node_t[0], atol=1e-6)

    def test_consistent_graph_stays(self):
        gt = circle_poses(12)
        g = pose_graph.empty(12, 24)
        g = dataclasses.replace(
            g,
            node_q=jnp.stack([p.q for p in gt]), node_t=jnp.stack([p.t for p in gt]),
            node_valid=jnp.ones(12, bool),
        )
        ei = list(range(11)); ej = list(range(1, 12))
        rels = [se3.compose(se3.inverse(gt[i]), gt[i + 1]) for i in range(11)]
        pad = 24 - 11
        g = dataclasses.replace(
            g,
            edge_i=jnp.asarray(ei + [0] * pad, jnp.int32),
            edge_j=jnp.asarray(ej + [0] * pad, jnp.int32),
            edge_q=jnp.concatenate([jnp.stack([r.q for r in rels]), jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (pad, 1))]),
            edge_t=jnp.concatenate([jnp.stack([r.t for r in rels]), jnp.zeros((pad, 3))]),
            edge_valid=jnp.asarray([True] * 11 + [False] * pad),
        )
        fixed = jnp.zeros(12, bool).at[0].set(True)
        g2, cost = pose_graph.optimize(g, fixed, iters=5)
        for i in range(12):
            np.testing.assert_allclose(g2.node_t[i], gt[i].t, atol=1e-4)
        assert float(cost) < 1e-6
