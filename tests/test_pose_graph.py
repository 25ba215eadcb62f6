"""Pose-graph optimization: drift correction on a synthetic loop."""

import dataclasses

import pytest

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


def _reference_style_graph(K, n, n_succ=5, loop_pad=16, loops=((0, 45), (3, 47)),
                           noise=0.05, seed=0):
    """Graph shaped like loop_closing._build_graph's output: n_succ·K
    sequential edges FIRST (band), then a padded loop-edge bucket."""
    rng = np.random.default_rng(seed)
    th = np.linspace(0, 2 * np.pi, n)
    pos = (np.stack([np.cos(th), np.sin(th), 0 * th], -1) * 5).astype(np.float32)
    qs = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (K, 1))
    ts = np.zeros((K, 3), np.float32)
    ts[:n] = pos
    gt = se3.SE3(jnp.asarray(qs), jnp.asarray(ts))
    ts_noisy = ts + rng.normal(0, noise, ts.shape).astype(np.float32) * \
        (np.arange(K) < n)[:, None]

    a = np.arange(K)
    ei, ej, eq, et, ev, ew = [], [], [], [], [], []
    for s in range(1, n_succ + 1):
        b = np.minimum(a + s, K - 1)
        rel = se3.compose(se3.inverse(se3.index(gt, jnp.asarray(a))),
                          se3.index(gt, jnp.asarray(b)))
        ei.append(a); ej.append(b)
        eq.append(np.asarray(rel.q)); et.append(np.asarray(rel.t))
        ev.append(a + s < n); ew.append(np.full(K, 1.0 / s, np.float32))
    li = np.zeros(loop_pad, np.int32); lj = np.zeros(loop_pad, np.int32)
    lq = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (loop_pad, 1))
    lt = np.zeros((loop_pad, 3), np.float32)
    lv = np.zeros(loop_pad, bool)
    for e, (i, j) in enumerate(loops):
        rel = se3.compose(se3.inverse(se3.index(gt, jnp.asarray(i))),
                          se3.index(gt, jnp.asarray(j)))
        li[e], lj[e] = i, j
        lq[e] = np.asarray(rel.q); lt[e] = np.asarray(rel.t); lv[e] = True
    ei.append(li); ej.append(lj); eq.append(lq); et.append(lt); ev.append(lv)
    ew.append(np.full(loop_pad, 5.0, np.float32))

    g = pose_graph.PoseGraph(
        node_q=jnp.asarray(qs), node_t=jnp.asarray(ts_noisy),
        node_valid=jnp.asarray(np.arange(K) < n),
        edge_i=jnp.asarray(np.concatenate(ei), jnp.int32),
        edge_j=jnp.asarray(np.concatenate(ej), jnp.int32),
        edge_q=jnp.asarray(np.concatenate(eq)),
        edge_t=jnp.asarray(np.concatenate(et)),
        edge_valid=jnp.asarray(np.concatenate(ev)),
        edge_weight=jnp.asarray(np.concatenate(ew)))
    return g, ts, ts_noisy, n_succ * K


class TestBandedSolver:
    """optimize_banded: the O(K) block-tridiagonal + Woodbury path."""

    def test_matches_dense(self):
        g, ts, _, band_edges = _reference_style_graph(K=64, n=50)
        fixed = jnp.zeros(64, bool).at[0].set(True)
        gd, cd = pose_graph.optimize(g, fixed, iters=25)
        gb, cb = pose_graph.optimize_banded(g, fixed, band_edges=band_edges,
                                            iters=25)
        np.testing.assert_allclose(np.asarray(gb.node_t[:50]),
                                   np.asarray(gd.node_t[:50]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(gb.node_q[:50]),
                                   np.asarray(gd.node_q[:50]), atol=2e-5)

    def test_reduces_error_large_graph(self):
        # A graph size the dense path cannot reasonably handle; loops pin
        # widely separated nodes.
        K, n = 512, 500
        g, ts, ts_noisy, band_edges = _reference_style_graph(
            K=K, n=n, loops=((0, 450), (10, 480), (200, 490)), noise=0.08)
        fixed = jnp.zeros(K, bool).at[0].set(True)
        gb, cost = pose_graph.optimize_banded(g, fixed, band_edges=band_edges,
                                              iters=15)
        err_before = np.linalg.norm(ts_noisy[:n] - ts[:n], axis=-1).max()
        err_after = np.linalg.norm(
            np.asarray(gb.node_t[:n]) - ts[:n], axis=-1).max()
        assert err_after < 0.4 * err_before, (err_after, err_before)

    def test_fixed_node_unmoved(self):
        g, _, ts_noisy, band_edges = _reference_style_graph(K=64, n=50)
        fixed = jnp.zeros(64, bool).at[0].set(True)
        gb, _ = pose_graph.optimize_banded(g, fixed, band_edges=band_edges,
                                           iters=10)
        np.testing.assert_allclose(np.asarray(gb.node_t[0]), ts_noisy[0],
                                   atol=1e-6)


def _cold_drifted_ring(K=2048, n=2000, n_succ=5, loop_pad=8,
                       yaw_drift=5e-5, t_drift=6e-4):
    """The round-4 verdict's clamp stress scenario: a KITTI-scale ring whose
    ODOMETRY drifts smoothly (yaw + translation bias per step, ~1 % of the
    126 m path), nodes initialized AT the drifted odometry — so the
    sequential band is self-consistent (zero residual, exactly what
    loop_closing._build_graph emits from the odometry table) and ONE fresh
    loop edge carries the entire accumulated drift.  Minimal anchors: only
    node 0 fixed."""
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    radius = 20.0
    pos_gt = np.stack([radius * np.cos(th), radius * np.sin(th), 0 * th], -1)
    yaw_gt = th + np.pi / 2                       # heading along the circle
    # Drifted odometry: integrate true per-step motion in the drifted frame
    # with a constant yaw-rate bias and a forward translation bias.
    yaw_d = np.zeros(n)
    pos_d = np.zeros((n, 3))
    yaw_d[0], pos_d[0] = yaw_gt[0], pos_gt[0]
    for i in range(n - 1):
        dyaw = (yaw_gt[i + 1] - yaw_gt[i]) + yaw_drift
        # True step expressed in frame i, replayed from the drifted frame.
        step_w = pos_gt[i + 1] - pos_gt[i]
        c, s = np.cos(yaw_d[i] - yaw_gt[i]), np.sin(yaw_d[i] - yaw_gt[i])
        Rz = np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        pos_d[i + 1] = pos_d[i] + Rz @ step_w + t_drift * np.asarray(
            [np.cos(yaw_d[i]), np.sin(yaw_d[i]), 0.0])
        yaw_d[i + 1] = yaw_d[i] + dyaw

    def yaw_quat(y):
        return np.stack([np.cos(y / 2), 0 * y, 0 * y, np.sin(y / 2)], -1)

    q_d = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (K, 1))
    t_d = np.zeros((K, 3), np.float32)
    q_d[:n] = yaw_quat(yaw_d)
    t_d[:n] = pos_d
    nodes_d = se3.SE3(jnp.asarray(q_d), jnp.asarray(t_d))
    q_gt = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (K, 1))
    t_gt = np.zeros((K, 3), np.float32)
    q_gt[:n] = yaw_quat(yaw_gt)
    t_gt[:n] = pos_gt
    nodes_gt = se3.SE3(jnp.asarray(q_gt), jnp.asarray(t_gt))

    a = np.arange(K)
    ei, ej, eq, et, ev, ew = [], [], [], [], [], []
    for s in range(1, n_succ + 1):
        b = np.minimum(a + s, K - 1)
        rel = se3.compose(se3.inverse(se3.index(nodes_d, jnp.asarray(a))),
                          se3.index(nodes_d, jnp.asarray(b)))
        ei.append(a); ej.append(b)
        eq.append(np.asarray(rel.q)); et.append(np.asarray(rel.t))
        ev.append(a + s < n); ew.append(np.full(K, 1.0 / s, np.float32))
    li = np.zeros(loop_pad, np.int32); lj = np.zeros(loop_pad, np.int32)
    lq = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (loop_pad, 1))
    lt = np.zeros((loop_pad, 3), np.float32)
    lv = np.zeros(loop_pad, bool)
    i, j = 0, n - 10
    rel = se3.compose(se3.inverse(se3.index(nodes_gt, jnp.asarray(i))),
                      se3.index(nodes_gt, jnp.asarray(j)))
    li[0], lj[0] = i, j
    lq[0] = np.asarray(rel.q); lt[0] = np.asarray(rel.t); lv[0] = True
    ei.append(li); ej.append(lj); eq.append(lq); et.append(lt)
    ev.append(lv); ew.append(np.full(loop_pad, 5.0, np.float32))
    g = pose_graph.PoseGraph(
        node_q=jnp.asarray(q_d), node_t=jnp.asarray(t_d),
        node_valid=jnp.asarray(a < n),
        edge_i=jnp.asarray(np.concatenate(ei), jnp.int32),
        edge_j=jnp.asarray(np.concatenate(ej), jnp.int32),
        edge_q=jnp.asarray(np.concatenate(eq)),
        edge_t=jnp.asarray(np.concatenate(et)),
        edge_valid=jnp.asarray(np.concatenate(ev)),
        edge_weight=jnp.asarray(np.concatenate(ew)))
    drift = float(np.linalg.norm(pos_d[n - 10] - pos_gt[n - 10]))
    return g, np.asarray(t_gt), n_succ * K, drift


class TestPgoIterationClamp:
    """loop_closing.optimize_graph clamps the banded solve at
    min(pgo_iters, 20) against the reference's optimize(100)
    (vo_loopclosing.cpp:885).  This stress case shows the clamp is harmless
    on the hardest cold-start shape: a 2048-node ring, a single fresh loop
    edge carrying >1 m of accumulated drift, one anchor."""

    @pytest.mark.slow
    def test_20_iters_matches_100_on_cold_2048_ring(self):
        g, t_gt, band_edges, drift = _cold_drifted_ring()
        assert drift > 1.0, f"scenario too easy: drift {drift:.2f} m"
        fixed = jnp.zeros(2048, bool).at[0].set(True)
        g20, c20 = pose_graph.optimize_banded(g, fixed,
                                              band_edges=band_edges,
                                              iters=20)
        g100, c100 = pose_graph.optimize_banded(g, fixed,
                                                band_edges=band_edges,
                                                iters=100)
        c20, c100 = float(c20), float(c100)
        # The clamp must not leave cost on the table vs the reference's 100.
        assert c20 <= 1.05 * c100 + 1e-6, (c20, c100)
        # ...and must land on the same solution (sub-cm over a 126 m path).
        d = np.linalg.norm(np.asarray(g20.node_t[:2000]) -
                           np.asarray(g100.node_t[:2000]), axis=-1)
        assert float(d.max()) < 0.01, float(d.max())
        # Both close most of the drift at the loop node.
        err20 = np.linalg.norm(np.asarray(g20.node_t[1990]) - t_gt[1990])
        assert err20 < 0.3 * drift, (err20, drift)
