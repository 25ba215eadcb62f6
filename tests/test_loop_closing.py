"""Loop-closing integration: detect a revisit on a synthetic out-and-back
sequence with injected odometry drift, and correct it via PGO."""

import numpy as np
import jax.numpy as jnp
import pytest

from flvis_tpu.config import LoopConfig
from flvis_tpu.geometry import camera, se3, so3
from flvis_tpu.io.synthetic import PlanarScene, SceneConfig
from flvis_tpu.loop.loop_closing import LoopCloser


def out_and_back_poses(n):
    """Camera pans right then returns; frame n-1 ≈ frame 0's viewpoint."""
    half = n // 2
    xs = list(np.linspace(0, 0.8, half)) + list(np.linspace(0.8, 0.02, n - half))
    poses = []
    for x in xs:
        R = np.eye(3)
        C = np.array([x, 0.0, 0.0])
        poses.append((R, -R @ C))
    return poses


@pytest.fixture(scope="module")
def loop_run():
    scfg = SceneConfig()
    scene = PlanarScene(scfg, plane_depth=8.0, seed=11)
    cam = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                      width=scfg.width, height=scfg.height)
    cfg = LoopConfig(max_keyframes=64, num_orb_features=200, vocab_words=128,
                     kf_start=12, kf_dist=10, kf_max_dist=64, nkf_closest=2,
                     min_pts=12, min_score=0.03, ratio_ransac=0.3,
                     seq_edge_successors=3)
    lc = LoopCloser(cfg, cam)
    n = 28
    poses = out_and_back_poses(n)
    # Odometry with linearly accumulating drift along +y.
    gt_T, odo_T = [], []
    for k, (R, t) in enumerate(poses):
        T_gt = se3.SE3(so3.from_matrix(jnp.asarray(R, jnp.float32)), jnp.asarray(t, jnp.float32))
        drift = 0.01 * k
        T_odo = se3.SE3(T_gt.q, T_gt.t + jnp.asarray([0.0, drift, 0.0]))
        gt_T.append(T_gt)
        odo_T.append(T_odo)
    closures = []
    for k, (R, t) in enumerate(poses):
        img_l, img_r, _ = scene.render(R, t)
        idx = lc.add_keyframe(img_l, img_r, odo_T[k], frame_id=k)
        res = lc.detect_loop(idx)
        if res is not None:
            closures.append(res)
            lc.optimize_graph()
    return lc, closures, gt_T, odo_T, n


class TestLoopClosing:
    def test_detects_revisit(self, loop_run):
        lc, closures, gt_T, odo_T, n = loop_run
        assert len(closures) >= 1, "no loop closure detected"
        c = closures[0]
        # The closure must connect a late frame to an early one.
        assert c.kf_j - c.kf_i >= 10
        assert c.num_inliers >= 12

    def test_pgo_reduces_drift(self, loop_run):
        lc, closures, gt_T, odo_T, n = loop_run
        last = n - 1
        C_gt = np.asarray(se3.inverse(gt_T[last]).t)
        C_odo = np.asarray(se3.inverse(odo_T[last]).t)
        C_corr = np.asarray(lc.kf_T_wc[last].t)
        err_odo = np.linalg.norm(C_odo - C_gt)
        err_corr = np.linalg.norm(C_corr - C_gt)
        assert err_odo > 0.2  # the injected drift
        assert err_corr < 0.6 * err_odo, (err_corr, err_odo)

    def test_corrected_pose_applies_drift(self, loop_run):
        lc, closures, gt_T, odo_T, n = loop_run
        # The drift transform maps the newest odometry pose onto its
        # corrected node exactly.
        T = lc.corrected_pose(odo_T[n - 1])
        np.testing.assert_allclose(
            np.asarray(se3.inverse(T).t), np.asarray(lc.kf_T_wc[n - 1].t), atol=1e-5
        )


def _inject_run(n, loops, drift_step=0.01, cfg=None):
    """LoopCloser with pose tables injected directly (no image ingest):
    straight-line ground truth along +x, odometry drifting along +y, plus
    accepted closures carrying the TRUE relative poses."""
    from flvis_tpu.loop.loop_closing import LoopClosure

    cam = camera.make(200.0, 200.0, 128.0, 96.0, 0.12, width=256, height=192)
    cfg = cfg or LoopConfig(max_keyframes=max(64, n), num_orb_features=32,
                            vocab_words=16)
    lc = LoopCloser(cfg, cam)
    gt_T, odo_T = [], []
    for k in range(n):
        t_gt = jnp.asarray([-0.1 * k, 0.0, 0.0], jnp.float32)  # T_c_w t
        T_gt = se3.SE3(so3.identity(), t_gt)
        T_odo = se3.SE3(T_gt.q, T_gt.t + jnp.asarray([0.0, drift_step * k, 0.0]))
        gt_T.append(T_gt)
        odo_T.append(T_odo)
        T_wc = se3.inverse(T_odo)
        lc.kf_q_odom = lc.kf_q_odom.at[k].set(T_wc.q)
        lc.kf_t_odom = lc.kf_t_odom.at[k].set(T_wc.t)
        lc.kf_q = lc.kf_q.at[k].set(T_wc.q)
        lc.kf_t = lc.kf_t.at[k].set(T_wc.t)
    lc.count = n
    for (i, j) in loops:
        T_ij = se3.compose(gt_T[i], se3.inverse(gt_T[j]))  # T_wc_i⁻¹ T_wc_j
        lc.closures.append(LoopClosure(i, j, 50, T_ij))
    return lc, gt_T, odo_T


class TestWindowedPGO:
    """The reference optimizes only [first loop id, last loop id]
    (vo_loopclosing.cpp:745-780): nodes before the window must not move;
    nodes after it are re-based onto the updated drift."""

    def test_prewindow_untouched_postwindow_rebased(self):
        n, i0, j1 = 40, 10, 30
        lc, gt_T, odo_T = _inject_run(n, [(i0, j1)])
        pre_q = np.asarray(lc.kf_q[:i0]).copy()
        pre_t = np.asarray(lc.kf_t[:i0]).copy()
        lc.optimize_graph()
        # Before the window: bitwise untouched.
        np.testing.assert_array_equal(np.asarray(lc.kf_q[:i0]), pre_q)
        np.testing.assert_array_equal(np.asarray(lc.kf_t[:i0]), pre_t)
        # Loop endpoint: drift largely absorbed.
        C_gt = np.asarray(se3.inverse(gt_T[j1]).t)
        C_odo = np.asarray(se3.inverse(odo_T[j1]).t)
        C_corr = np.asarray(lc.kf_T_wc[j1].t)
        assert np.linalg.norm(C_corr - C_gt) < 0.5 * np.linalg.norm(C_odo - C_gt)
        # After the window: exactly drift ∘ odometry (rigid re-base).
        for k in range(j1 + 1, n):
            expect = se3.compose(lc.T_map_odom, se3.inverse(odo_T[k]))
            np.testing.assert_allclose(np.asarray(lc.kf_T_wc[k].t),
                                       np.asarray(expect.t), atol=1e-5)

    def test_large_window_uses_banded_solver(self):
        """A >256-node loop window routes through optimize_banded and still
        closes the loop (the dense path would allocate a (1024,1024,6,6) H)."""
        n = 600
        lc, gt_T, odo_T = _inject_run(
            n, [(5, 590)], drift_step=0.002,
            cfg=LoopConfig(max_keyframes=1024, num_orb_features=32,
                           vocab_words=16, pgo_iters=12))
        lc.optimize_graph()
        C_gt = np.asarray(se3.inverse(gt_T[590]).t)
        C_odo = np.asarray(se3.inverse(odo_T[590]).t)
        C_corr = np.asarray(lc.kf_T_wc[590].t)
        err_odo = np.linalg.norm(C_odo - C_gt)
        err_corr = np.linalg.norm(C_corr - C_gt)
        assert err_corr < 0.3 * err_odo, (err_corr, err_odo)


class TestBatchedIngest:
    def test_batch_matches_stepwise(self):
        """add_keyframes_batch (one fused device program per chunk) must
        leave the SAME store contents as the stepwise add_keyframe loop —
        same features, depths, poses, and BoW rows (given a shared
        pretrained vocabulary), and the same loop detections."""
        from flvis_tpu.loop import bow

        scfg = SceneConfig(width=256, height=192, fx=200.0, fy=200.0,
                           cx=128.0, cy=96.0, baseline=0.12)
        scene = PlanarScene(scfg, plane_depth=8.0, seed=21)
        cam = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                          width=scfg.width, height=scfg.height)
        cfg = LoopConfig(max_keyframes=32, num_orb_features=128,
                         vocab_words=64, kf_start=4, kf_dist=2,
                         kf_max_dist=32, nkf_closest=1, min_score=0.0)
        # Shared pretrained vocabulary so BoW rows are comparable exactly.
        lc_tr = LoopCloser(cfg, cam)
        frames = []
        for k in range(12):
            t = np.asarray([0.05 * k, 0.0, 0.0], np.float32)
            img_l, img_r, _ = scene.render(np.eye(3), t)
            frames.append((img_l, img_r, t))
            if k < 9:
                lc_tr.add_keyframe(img_l, img_r,
                                   se3.SE3(so3.identity(), jnp.asarray(t)),
                                   frame_id=k)
        vocab = lc_tr.vocab
        assert vocab is not None

        lc_a = LoopCloser(cfg, cam, vocab=vocab)
        lc_b = LoopCloser(cfg, cam, vocab=vocab)
        for k, (il, ir, t) in enumerate(frames):
            lc_a.add_keyframe(il, ir, se3.SE3(so3.identity(),
                                              jnp.asarray(t)), frame_id=k)
        # Batch path: two chunks (7 + 5 keyframes) with stacked images.
        for lo, hi in ((0, 7), (7, 12)):
            il = jnp.asarray(np.stack([frames[i][0] for i in range(lo, hi)]))
            ir = jnp.asarray(np.stack([frames[i][1] for i in range(lo, hi)]))
            q = np.tile(np.asarray([1.0, 0, 0, 0], np.float32),
                        (hi - lo, 1))
            t = np.stack([frames[i][2] for i in range(lo, hi)])
            ks = lc_b.add_keyframes_batch(il, ir, list(range(hi - lo)), q, t,
                                          list(range(lo, hi)))
            assert ks == list(range(lo, hi))
        assert lc_b.count == lc_a.count == 12
        # Descriptors: vmapped vs stepwise lowering reorders the orientation
        # moment reduction by ~1e-5 rad, which can flip the odd NEAR-TIE
        # BRIEF bit — allow a few flipped bits across all 12×128
        # descriptors, not exact equality.
        xor = np.bitwise_xor(np.asarray(lc_b.kf_desc[:12]),
                             np.asarray(lc_a.kf_desc[:12]))
        nbits = int(np.unpackbits(xor.view(np.uint8)).sum())
        assert nbits <= 16, f"{nbits} descriptor bits differ"
        np.testing.assert_array_equal(np.asarray(lc_b.kf_kp_valid[:12]),
                                      np.asarray(lc_a.kf_kp_valid[:12]))
        np.testing.assert_allclose(np.asarray(lc_b.kf_pc[:12]),
                                   np.asarray(lc_a.kf_pc[:12]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(lc_b.kf_q[:12]),
                                   np.asarray(lc_a.kf_q[:12]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(lc_b.kf_t[:12]),
                                   np.asarray(lc_a.kf_t[:12]), atol=1e-6)
        # BoW rows: a flipped near-tie bit can move one descriptor across a
        # word boundary; bound the per-row L1 difference instead of exact.
        bow_l1 = np.abs(np.asarray(lc_b.bow_db[:12])
                        - np.asarray(lc_a.bow_db[:12])).sum(axis=-1)
        assert float(bow_l1.max()) < 0.05, bow_l1
        np.testing.assert_array_equal(lc_b.kf_frame_id[:12],
                                      lc_a.kf_frame_id[:12])
        got_a = lc_a.detect_loops_batch(list(range(12)))
        got_b = lc_b.detect_loops_batch(list(range(12)))
        assert [(c.kf_i, c.kf_j) for c in got_a] == \
            [(c.kf_i, c.kf_j) for c in got_b]

    def test_batch_grows_capacity_and_trains_vocab(self):
        """A batch larger than the remaining capacity grows the store, and
        in-run vocabulary training triggers from batched ingest too."""
        scfg = SceneConfig(width=256, height=192, fx=200.0, fy=200.0,
                           cx=128.0, cy=96.0, baseline=0.12)
        scene = PlanarScene(scfg, plane_depth=8.0, seed=22)
        cam = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                          width=scfg.width, height=scfg.height)
        cfg = LoopConfig(max_keyframes=8, num_orb_features=128,
                         vocab_words=64, kf_start=4, kf_dist=2,
                         kf_max_dist=32, nkf_closest=1, min_score=0.0)
        lc = LoopCloser(cfg, cam)
        n = 12
        il = jnp.asarray(np.stack(
            [scene.render(np.eye(3),
                          np.asarray([0.05 * k, 0, 0], np.float32))[0]
             for k in range(n)]))
        ir = jnp.asarray(np.stack(
            [scene.render(np.eye(3),
                          np.asarray([0.05 * k, 0, 0], np.float32))[1]
             for k in range(n)]))
        q = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (n, 1))
        t = np.stack([np.asarray([0.05 * k, 0, 0], np.float32)
                      for k in range(n)])
        ks = lc.add_keyframes_batch(il, ir, list(range(n)), q, t,
                                    list(range(n)))
        assert ks == list(range(n))
        assert lc.count == n and lc.bow_db.shape[0] == 16
        assert lc.vocab is not None           # trained from batched buffer
        # BoW rows back-filled for the whole batch.
        assert float(jnp.sum(jnp.abs(lc.bow_db[:n]))) > 0
        lc.detect_loops_batch([n - 1])


class TestCapacityGrowth:
    def test_database_grows_past_max_keyframes(self):
        """KITTI-length runs exceed any fixed keyframe budget: the store
        must grow (round 1 raised RuntimeError at capacity)."""
        scfg = SceneConfig(width=256, height=192, fx=200.0, fy=200.0,
                           cx=128.0, cy=96.0, baseline=0.12)
        scene = PlanarScene(scfg, plane_depth=8.0, seed=7)
        cam = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                          width=scfg.width, height=scfg.height)
        cfg = LoopConfig(max_keyframes=8, num_orb_features=128, vocab_words=64,
                         kf_start=4, kf_dist=2, kf_max_dist=32, nkf_closest=1,
                         min_score=0.0)
        lc = LoopCloser(cfg, cam)
        for k in range(12):
            R = np.eye(3)
            t = np.asarray([0.05 * k, 0.0, 0.0], np.float32)
            img_l, img_r, _ = scene.render(R, t)
            lc.add_keyframe(img_l, img_r, se3.SE3(so3.identity(),
                                                  jnp.asarray(t)), frame_id=k)
        assert lc.count == 12
        assert lc.bow_db.shape[0] == 16
        assert lc.kf_desc.shape[0] == 16
        assert list(lc.kf_frame_id[:12]) == list(range(12))
        # Search still works over the grown store.
        lc.detect_loop(11)


class TestAdaptiveGate:
    """The adaptive minimum-score gate (isLoopCandidate's lc_min_score,
    vo_loopclosing.cpp:547-575): on similarity-aliased scenes — where a
    query's recent temporal neighbours already score moderately against it —
    the accept bar rises to that neighbour level, rejecting aliased
    candidates that a fixed minScore would pass."""

    def _rows(self, db, k, lo, hi, cfg):
        from flvis_tpu.loop.loop_closing import _gate_decision, _gate_rows

        row = np.asarray(_gate_rows(
            jnp.asarray(db), jnp.asarray(np.arange(len(db)) < len(db)),
            jnp.asarray([k], jnp.int32), jnp.asarray([lo], jnp.int32),
            jnp.asarray([hi], jnp.int32),
            jnp.asarray(cfg.kf_max_dist, jnp.int32)))[0]
        return row, _gate_decision(row, lo, hi, cfg)

    def _db(self, n_words=4096, K=40, query_sim=0.3, cand_sim=0.25, cand=5):
        """BoW rows engineered so every recent neighbour scores ~query_sim
        against the query (row K-1) and the window candidate scores
        cand_sim.  Rows are SPARSE with near-disjoint random supports, so
        for L1-normalized rows the mixing fraction f of the query vector
        gives L1 similarity s = 1 - 0.5*|a-b|_1 ≈ f exactly (dense random
        rows would already overlap at ~0.66 and defeat the construction)."""
        rng = np.random.default_rng(0)

        def rand_row():
            r = np.zeros(n_words, np.float32)
            idx = rng.choice(n_words, 16, replace=False)
            r[idx] = rng.uniform(0.5, 1.0, 16).astype(np.float32)
            return r / r.sum()

        q = rand_row()
        db = np.zeros((K, n_words), np.float32)
        for i in range(K):
            mix = 0.0
            if i == K - 1:
                mix = 1.0
            elif i >= K - 11:          # recent temporal neighbours
                mix = query_sim
            elif abs(i - cand) <= 2:   # candidate + its consistency support
                mix = cand_sim
            db[i] = mix * q + (1 - mix) * rand_row()
        return db

    def test_aliased_candidate_rejected(self):
        cfg = LoopConfig(min_score=0.02, kf_dist=10, kf_max_dist=40,
                         nkf_closest=1)
        db = self._db(query_sim=0.35, cand_sim=0.25)
        row, cand = self._rows(db, k=39, lo=0, hi=29, cfg=cfg)
        # The fixed bar alone would accept (best ≥ 0.25 > minScore 0.02);
        # the adaptive bar (≈0.35 from the self-similar neighbours) rejects.
        assert float(row[1]) > cfg.min_score
        assert cand is None

    def test_true_revisit_beats_adaptive_bar(self):
        cfg = LoopConfig(min_score=0.02, kf_dist=10, kf_max_dist=40,
                         nkf_closest=1)
        db = self._db(query_sim=0.3, cand_sim=0.7)
        row, cand = self._rows(db, k=39, lo=0, hi=29, cfg=cfg)
        assert cand is not None and abs(cand - 5) <= 2

    def test_bar_clamped_at_04(self):
        """Extremely self-similar neighbours must not push the bar past 0.4
        (the reference's clamp) — a strong genuine revisit still passes."""
        cfg = LoopConfig(min_score=0.02, kf_dist=10, kf_max_dist=40,
                         nkf_closest=1)
        db = self._db(query_sim=0.9, cand_sim=0.6)
        row, cand = self._rows(db, k=39, lo=0, hi=29, cfg=cfg)
        assert abs(float(row[3]) - 0.4) < 1e-5
        assert cand is not None


class TestSearchWindowVsNeighbourRadius:
    """The reference searches candidates in a HARDCODED 5000-KF window
    (vo_loopclosing.cpp:529-534) and uses YAML lcKFMaxDist ONLY as the
    neighbour-consistency radius |idx − idx_best| ≤ lcKFMaxDist (line 568).
    Conflating them (round 2) made reference YAML configs cripple the search
    to a ~30-KF lookback and the default config's neighbour check vacuous."""

    def _sparse_row(self, rng, n_words=2048):
        r = np.zeros(n_words, np.float32)
        idx = rng.choice(n_words, 16, replace=False)
        r[idx] = rng.uniform(0.5, 1.0, 16).astype(np.float32)
        return r / r.sum()

    def _db(self, K, query, cand_rows, cand_sim=0.7, n_words=2048, seed=0):
        rng = np.random.default_rng(seed)
        db = np.zeros((K, n_words), np.float32)
        for i in range(K):
            mix = cand_sim if i in cand_rows else 0.0
            if i == K - 1:
                mix = 1.0
            db[i] = mix * query + (1 - mix) * self._sparse_row(rng, n_words)
        return db

    def test_reference_yaml_finds_loop_500_kfs_back(self, tmp_path):
        """A KITTI-style YAML (lcKFMaxDist=50, lcKFDist=18) must still find
        a candidate 500 keyframes back — with the round-2 conflation the
        lookback was [k−50, k−18) and this loop was invisible."""
        from flvis_tpu.config import load_yaml
        from flvis_tpu.loop.loop_closing import _gate_decision, _gate_rows

        y = tmp_path / "kitti_style.yaml"
        y.write_text("type_of_vi: 4\nlcKFStart: 30\nlcKFDist: 18\n"
                     "lcKFMaxDist: 50\nlcNKFClosest: 2\nminScore: 0.02\n")
        cfg = load_yaml(str(y)).loop
        assert cfg.kf_dist == 18 and cfg.kf_max_dist == 50
        assert cfg.search_window == 5000

        K = 560
        rng = np.random.default_rng(1)
        query = self._sparse_row(rng)
        cand = K - 1 - 500                       # 500 KFs back
        db = self._db(K, query, {cand, cand + 3, cand - 3}, seed=2)
        k = K - 1
        hi = k - cfg.kf_dist
        lo = max(0, hi - cfg.search_window)
        assert lo == 0                           # window spans the whole run
        row = np.asarray(_gate_rows(
            jnp.asarray(db), jnp.asarray(np.arange(K) < K),
            jnp.asarray([k], np.int32), jnp.asarray([lo], np.int32),
            jnp.asarray([hi], np.int32),
            jnp.asarray(cfg.kf_max_dist, np.int32)))[0]
        got = _gate_decision(row, lo, hi, cfg)
        assert got is not None and abs(got - cand) <= 3

    def test_neighbour_gate_rejects_distant_support(self):
        """Aliased scene: the best candidate's only supporting scores sit
        ~200 KFs away from it.  With the neighbour radius = 50 the
        consistency count must be 0 → reject; with the round-2 vacuous gate
        (radius = whole window) the same db was accepted."""
        from flvis_tpu.loop.loop_closing import _gate_decision, _gate_rows

        cfg = LoopConfig(min_score=0.02, kf_dist=18, kf_max_dist=50,
                         nkf_closest=2)
        K = 400
        rng = np.random.default_rng(3)
        query = self._sparse_row(rng)
        cand = 40
        # Support rows are far (> kf_max_dist) from the candidate: aliasing,
        # not a consistent revisit neighbourhood.
        db = self._db(K, query, {cand, 240, 250}, seed=4)
        k = K - 1
        hi = k - cfg.kf_dist
        lo = max(0, hi - cfg.search_window)
        gate = lambda nb: _gate_decision(np.asarray(_gate_rows(
            jnp.asarray(db), jnp.asarray(np.arange(K) < K),
            jnp.asarray([k], np.int32), jnp.asarray([lo], np.int32),
            jnp.asarray([hi], np.int32),
            jnp.asarray(nb, np.int32)))[0], lo, hi, cfg)
        assert gate(cfg.kf_max_dist) is None          # radius 50: rejected
        assert gate(K) is not None                    # vacuous radius: passed


class TestPretrainedVocab:
    def test_save_load_and_detect_with_pretrained_vocab(self, tmp_path):
        """End-to-end pretrained-vocabulary path: train on one run, save,
        reload, and hand the loaded vocabulary to a fresh LoopCloser (the
        reference's /voc param + DBoW3 file load, vo_loopclosing.cpp:
        1095-1102).  Detection must work from keyframe 0 with no in-run
        training, and BoW rows must match the original vocabulary's."""
        from flvis_tpu.loop import bow

        scfg = SceneConfig(width=256, height=192, fx=200.0, fy=200.0,
                           cx=128.0, cy=96.0, baseline=0.12)
        scene = PlanarScene(scfg, plane_depth=8.0, seed=9)
        cam = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                          width=scfg.width, height=scfg.height)
        cfg = LoopConfig(max_keyframes=32, num_orb_features=128, vocab_words=64,
                         kf_start=4, kf_dist=2, kf_max_dist=32, nkf_closest=1,
                         min_score=0.0)
        lc0 = LoopCloser(cfg, cam)
        for k in range(10):
            t = np.asarray([0.04 * k, 0.0, 0.0], np.float32)
            img_l, img_r, _ = scene.render(np.eye(3), t)
            lc0.add_keyframe(img_l, img_r, se3.SE3(so3.identity(),
                                                   jnp.asarray(t)), frame_id=k)
        assert lc0.vocab is not None
        path = str(tmp_path / "voc.npz")
        bow.save(path, lc0.vocab)

        lc1 = LoopCloser(cfg, cam, vocab=bow.load(path))
        for k in range(10):
            t = np.asarray([0.04 * k, 0.0, 0.0], np.float32)
            img_l, img_r, _ = scene.render(np.eye(3), t)
            lc1.add_keyframe(img_l, img_r, se3.SE3(so3.identity(),
                                                   jnp.asarray(t)), frame_id=k)
        assert not lc1._desc_buffer       # no training buffer accumulated
        np.testing.assert_allclose(np.asarray(lc1.bow_db[:10]),
                                   np.asarray(lc0.bow_db[:10]), atol=1e-5)
        lc1.detect_loop(9)                # search path runs on loaded vocab


class TestVocabRefresh:
    def test_refresh_improves_late_scene_recognition(self):
        """In-run vocabulary refresh (LoopConfig.vocab_refresh_at): the
        opening-scene-trained vocabulary is retrained on the whole run and
        all BoW rows back-filled.  On a run whose texture statistics drift
        after the opening frames, the refreshed vocabulary must score a
        late-sequence revisit higher than the stale opening-scene one."""
        from flvis_tpu.loop import bow

        scfg = SceneConfig(width=256, height=192, fx=200.0, fy=200.0,
                           cx=128.0, cy=96.0, baseline=0.12)
        scene_a = PlanarScene(scfg, plane_depth=8.0, seed=31)
        from flvis_tpu.io.synthetic import MultiPlaneScene

        scene_b = MultiPlaneScene(scfg, seed=77)   # drifted texture stats
        frames = []
        for k in range(8):                          # opening scene A
            t = np.asarray([0.05 * k, 0.0, 0.0], np.float32)
            frames.append(scene_a.render(np.eye(3), t)[:2] + (t,))
        for k in range(14):                         # later scene B
            x = 0.05 * (k if k < 10 else 19 - k)    # out and back
            t = np.asarray([x, 0.0, 0.0], np.float32)
            frames.append(scene_b.render(np.eye(3), t)[:2] + (t,))
        # B-frames k=6 (x=0.30) and k=12 (x=0.35) are a NEAR revisit (a
        # 5 cm offset — identical viewpoints would give score 1.0 under any
        # vocabulary and measure nothing).
        qi, qj = 8 + 12, 8 + 6

        margins = {}
        for refresh_at in (0, 16):
            cfg = LoopConfig(max_keyframes=32, num_orb_features=128,
                             vocab_words=64, kf_start=4, kf_dist=2,
                             kf_max_dist=32, nkf_closest=1, min_score=0.0,
                             vocab_refresh_at=refresh_at)
            lc = LoopCloser(cfg, cam=camera.make(
                scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                width=scfg.width, height=scfg.height))
            for k, (il, ir, t) in enumerate(frames):
                lc.add_keyframe(il, ir, se3.SE3(so3.identity(),
                                                jnp.asarray(t)), frame_id=k)
            refreshed = (refresh_at > 0
                         and lc._next_vocab_refresh > refresh_at)
            assert refreshed == (refresh_at > 0)
            sims = np.asarray(jnp.stack([
                bow.score(lc.bow_db[qi], lc.bow_db[r])
                for r in range(8, 22) if r != qi]))
            rows = [r for r in range(8, 22) if r != qi]
            s_true = sims[rows.index(qj)]
            # Recognition margin: true near-revisit vs the best DISTANT
            # (false) candidate — what the candidate gate has to separate.
            false_rows = [r for r in rows if abs(r - qj) > 2
                          and abs(r - qi) > 2]
            s_false = max(sims[rows.index(r)] for r in false_rows)
            margins[refresh_at] = float(s_true - s_false)
        # The refreshed vocabulary separates the drifted-scene revisit from
        # false candidates better than the stale opening-scene vocabulary.
        assert margins[16] > margins[0], margins

    def test_refresh_repeats_on_doubling_schedule(self):
        """The refresh is NOT one-shot: it re-fires each time the run
        doubles past the last training point (8, 16, 32, ...), so a long
        run never ends with a vocabulary more than 2x staler than its
        database (round-3 weakness: a single refresh at KF 64 left a
        2000-KF run scoring its tail against an opening-scene word set)."""
        scfg = SceneConfig(width=256, height=192, fx=200.0, fy=200.0,
                           cx=128.0, cy=96.0, baseline=0.12)
        scene = PlanarScene(scfg, plane_depth=8.0, seed=5)
        cfg = LoopConfig(max_keyframes=64, num_orb_features=128,
                         vocab_words=64, kf_start=50, kf_dist=50,
                         vocab_refresh_at=8)
        lc = LoopCloser(cfg, cam=camera.make(
            scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
            width=scfg.width, height=scfg.height))
        vocab_ids = set()
        for k in range(34):
            t = np.asarray([0.03 * k, 0.0, 0.0], np.float32)
            il, ir, _ = scene.render(np.eye(3), t)
            lc.add_keyframe(il, ir, se3.SE3(so3.identity(), jnp.asarray(t)),
                            frame_id=k)
            if lc.vocab is not None:
                vocab_ids.add(id(lc.vocab))
        # Initial training at 8 KFs + refreshes at 8 (same call), 16, 32:
        # at least 3 distinct vocabulary objects observed, and the next
        # refresh is scheduled past the doubling point.
        assert len(vocab_ids) >= 3, len(vocab_ids)
        assert lc._next_vocab_refresh >= 64

    def test_held_out_scene_recognition(self):
        """Vocabulary generality (the reference assumes an OFFLINE DBoW3
        vocabulary trained on a diverse corpus): a vocabulary trained on
        scenes A-D must still separate a genuine revisit from false
        candidates in a NEVER-SEEN scene E — the corpus-trained analogue of
        the reference's pretrained-file path (vo_loopclosing.cpp:1095-1102)."""
        from scipy.spatial.transform import Rotation as Rot

        from flvis_tpu.loop import bow
        from flvis_tpu.ops import orb
        from flvis_tpu.io.synthetic import MultiPlaneScene

        scfg = SceneConfig(width=256, height=192, fx=200.0, fy=200.0,
                           cx=128.0, cy=96.0, baseline=0.12)
        # Training corpus: 4 scenes with different structure and textures.
        corpus = []
        for seed in (3, 14, 15, 92):
            sc = (PlanarScene(scfg, plane_depth=6.0 + seed % 5, seed=seed)
                  if seed % 2 else MultiPlaneScene(scfg, seed=seed))
            for k in range(4):
                t = np.asarray([0.08 * k, 0.0, 0.0], np.float32)
                il = sc.render(np.eye(3), t)[0]
                uv, desc, valid, _ = orb.detect_and_compute(
                    jnp.asarray(il), num_features=256)
                corpus.append(np.asarray(desc)[np.asarray(valid)])
        all_desc = np.concatenate(corpus, axis=0)
        vocab = bow.train(jnp.asarray(all_desc),
                          np.ones(len(all_desc), bool), num_words=512,
                          iters=6)

        # Held-out scene E: a yaw pan out and back (rotation changes the
        # view far faster than small translations — a 2-degree step shifts
        # the image ~7 px at fx=200, so viewpoint distance is measurable).
        # The return grid is offset 1 degree from the outbound grid, so the
        # revisit is near-identical but never pixel-identical.
        scene_e = MultiPlaneScene(scfg, seed=41)
        yaws = [2.0 * k for k in range(10)] + \
            [18.0 - 2.0 * k + 1.0 for k in range(9)]
        vecs = []
        for y in yaws:
            R = Rot.from_euler("y", y, degrees=True).as_matrix()
            il = scene_e.render(R, np.zeros(3, np.float32))[0]
            uv, desc, valid, _ = orb.detect_and_compute(
                jnp.asarray(il), num_features=256)
            vecs.append(bow.transform(vocab, desc, valid))
        qi = 17                          # return pass, yaw 5 deg
        sims = {r: float(bow.score(vecs[qi], vecs[r]))
                for r in range(len(yaws)) if r != qi}
        # True candidates: OUT-pass frames within 1 degree of the query.
        s_true = max(s for r, s in sims.items()
                     if r < 10 and abs(yaws[r] - yaws[qi]) <= 1.0)
        # False candidates: any frame more than 3 degrees away.
        s_false = max(s for r, s in sims.items()
                      if abs(yaws[r] - yaws[qi]) > 3.0)
        assert s_true > s_false, (
            f"held-out revisit not separated: true={s_true:.3f} "
            f"best-false={s_false:.3f}")


class TestLoopCloserSharded:
    def test_mesh_db_matches_dense_scores(self):
        """LoopCloser with a kf-sharded BoW database produces the same
        similarity scores as the single-device path."""
        import jax

        if len(jax.devices()) < 4:
            pytest.skip("needs multi-device mesh")
        from flvis_tpu.loop import bow
        from flvis_tpu.parallel import dist_loop

        scfg = SceneConfig(width=256, height=192, fx=200.0, fy=200.0,
                           cx=128.0, cy=96.0, baseline=0.12)
        scene = PlanarScene(scfg, plane_depth=8.0, seed=3)
        cam = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                          width=scfg.width, height=scfg.height)
        cfg = LoopConfig(max_keyframes=32, num_orb_features=128, vocab_words=64,
                         kf_start=4, kf_dist=2, kf_max_dist=32, nkf_closest=1,
                         min_score=0.0)
        mesh = dist_loop.make_kf_mesh(4)
        lc_sh = LoopCloser(cfg, cam, mesh=mesh)
        lc = LoopCloser(cfg, cam)
        for k in range(10):
            R = np.eye(3)
            t = np.asarray([0.05 * k, 0.0, 0.0], np.float32)
            img_l, img_r, _ = scene.render(R, t)
            T = se3.SE3(so3.identity(), jnp.asarray(t))
            lc_sh.add_keyframe(img_l, img_r, T, frame_id=k)
            lc.add_keyframe(img_l, img_r, T, frame_id=k)
        assert lc.vocab is not None and lc_sh.vocab is not None
        valid = jnp.arange(32) < 10
        for k in (6, 9):
            ref = np.asarray(bow.score_database(lc.bow_db[k], lc.bow_db, valid))
            got = np.asarray(dist_loop.score_database_sharded(
                mesh, lc_sh.bow_db[k], lc_sh.bow_db, valid))
            np.testing.assert_allclose(got, ref, atol=1e-5)


class TestLoopCloserDebugIO:
    def test_sim_matrix_dump_and_graph_snapshots(self, tmp_path):
        """Every-10-KF similarity dumps + before/after PGO graph snapshots
        (the reference's debug artifacts, vo_loopclosing.cpp:439-452,879,887)."""
        import jax

        scfg = SceneConfig(width=256, height=192, fx=200.0, fy=200.0,
                           cx=128.0, cy=96.0, baseline=0.12)
        scene = PlanarScene(scfg, plane_depth=8.0, seed=5)
        cam = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                          width=scfg.width, height=scfg.height)
        cfg = LoopConfig(max_keyframes=32, num_orb_features=128, vocab_words=64,
                         kf_start=6, kf_dist=4, kf_max_dist=32, nkf_closest=1,
                         min_pts=10, min_score=0.02, ratio_ransac=0.25,
                         seq_edge_successors=2)
        lc = LoopCloser(cfg, cam, dump_dir=str(tmp_path),
                        pgo_device=jax.devices()[-1])
        n = 14
        half = n // 2
        xs = list(np.linspace(0, 0.5, half)) + list(np.linspace(0.5, 0.01, n - half))
        for k, x in enumerate(xs):
            R = np.eye(3)
            t = -R @ np.asarray([x, 0.0, 0.0])
            img_l, img_r, _ = scene.render(R, t)
            drift = 0.012 * k
            T = se3.SE3(so3.identity(),
                        jnp.asarray(t + np.asarray([0.0, drift, 0.0]),
                                    jnp.float32))
            idx = lc.add_keyframe(img_l, img_r, T, frame_id=k)
            if lc.detect_loop(idx) is not None:
                lc.optimize_graph()
        sims = sorted(tmp_path.glob("sim_matrix_*.txt"))
        assert len(sims) >= 1
        m = np.loadtxt(sims[0])
        assert m.shape == (10, 10)
        np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-5)
        np.testing.assert_allclose(m, m.T, atol=1e-5)
        S = lc.sim_matrix()
        assert S.shape == (lc.count, lc.count)
        if lc.closures:
            before = sorted(tmp_path.glob("pose_graph_*_before.npz"))
            after = sorted(tmp_path.glob("pose_graph_*_after.npz"))
            assert before and after
            a = np.load(after[-1])
            assert a["node_q"].shape[1] == 4 and len(a["loops"]) >= 1
            # Accepted loops render a side-by-side match image
            # (vo_loopclosing.cpp:689-722 parity surface).
            matches = sorted(tmp_path.glob("loop_match_*.png"))
            assert len(matches) == len(lc.closures)
            import cv2

            m0 = cv2.imread(str(matches[0]))
            assert m0 is not None and m0.shape == (192, 512, 3)
