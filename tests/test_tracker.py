"""Frontend tracker tests: landmark-table mechanics and a full synthetic
visual-odometry run against ground truth (the golden-trajectory test the
reference never had — it only validated via dataset replay, SURVEY.md §4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flvis_tpu.config import FrontendConfig
from flvis_tpu.frontend import landmark_table as lt
from flvis_tpu.frontend import tracker
from flvis_tpu.geometry import camera, se3, so3
from flvis_tpu.io.synthetic import PlanarScene, SceneConfig, orbit_trajectory


class TestLandmarkTable:
    def test_fill_and_kill(self):
        t = lt.empty(8)
        cand = jnp.asarray([[1.0, 1], [2, 2], [3, 3], [4, 4]])
        valid = jnp.asarray([True, False, True, True])
        t2, nid = lt.fill_new_detections(t, cand, valid, se3.identity(), jnp.asarray(100))
        assert int(lt.num_active(t2)) == 3
        assert int(nid) == 103
        ids = np.asarray(t2.lm_id)[np.asarray(t2.active)]
        assert sorted(ids) == [100, 101, 102]
        # Kill one slot and refill: id continues, slot reused.
        dead = jnp.zeros(8, bool).at[0].set(True)
        t3 = lt.kill(t2, dead)
        assert int(lt.num_active(t3)) == 2
        t4, nid2 = lt.fill_new_detections(
            t3, jnp.asarray([[9.0, 9]]), jnp.asarray([True]), se3.identity(), nid
        )
        assert int(lt.num_active(t4)) == 3
        assert int(nid2) == 104

    def test_fill_respects_capacity(self):
        t = lt.empty(4)
        cand = jnp.ones((10, 2))
        valid = jnp.ones(10, bool)
        t2, nid = lt.fill_new_detections(t, cand, valid, se3.identity(), jnp.asarray(0))
        assert int(lt.num_active(t2)) == 4
        assert int(nid) == 4


def small_cfg(**kw):
    base = dict(
        width=512, height=384, num_slots=128, pyramid_levels=3,
        per_cell=8, min_distance=12.0, margin=22, lk_radius=10, lk_iters=12,
    )
    base.update(kw)
    return FrontendConfig(**base)


@pytest.fixture(scope="module")
def vo_run():
    """Run the tracker over a rendered synthetic stereo sequence."""
    scfg = SceneConfig()
    scene = PlanarScene(scfg, plane_depth=8.0, seed=1)
    poses = orbit_trajectory(25, step=0.03)
    cfg = small_cfg()
    cam = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                      width=scfg.width, height=scfg.height)
    state = tracker.init_state(cfg)
    est = []
    outs = []
    for (R, t) in poses:
        img_l, img_r, _ = scene.render(R, t)
        state, out = tracker.track_frame(
            cfg, cam, state, jnp.asarray(img_l), jnp.asarray(img_r)
        )
        est.append((np.asarray(out.T_c_w.q), np.asarray(out.T_c_w.t)))
        outs.append(out)
    return poses, est, outs, state


class TestVisualOdometry:
    def test_tracks_without_failure(self, vo_run):
        _, _, outs, state = vo_run
        statuses = [int(o.status) for o in outs]
        assert all(s == tracker.STATUS_TRACKING for s in statuses)
        assert all(int(o.num_inliers) > 30 for o in outs[1:])

    def test_trajectory_accuracy(self, vo_run):
        poses, est, _, _ = vo_run
        # Compare camera centres: C = -R^T t.
        errs = []
        for (R, t), (q_e, t_e) in zip(poses, est):
            C_gt = -R.T @ t
            R_e = np.asarray(so3.to_matrix(jnp.asarray(q_e)))
            C_e = -R_e.T @ t_e
            errs.append(np.linalg.norm(C_gt - C_e))
        ate_rmse = np.sqrt(np.mean(np.square(errs)))
        path_len = 0.03 * len(poses)
        assert ate_rmse < 0.02 * path_len + 0.01, f"ATE {ate_rmse:.4f} over {path_len:.2f} m path"

    def test_keyframe_cadence(self, vo_run):
        _, _, outs, state = vo_run
        kfs = sum(int(o.is_keyframe) for o in outs)
        # Bootstrap phase inserts a KF at least every 5 frames.
        assert kfs >= len(outs) // 5
        assert int(state.kf_count) == kfs

    def test_depth_convergence(self, vo_run):
        _, _, _, state = vo_run
        tab = state.table
        active3d = np.asarray(tab.active & tab.has_3d)
        assert active3d.sum() > 50
        # Landmarks live on the z=8 world plane.
        pz = np.asarray(tab.p_w)[active3d][:, 2]
        assert np.abs(pz - 8.0).mean() < 0.25


class TestFailureRecovery:
    def test_blank_frames_trigger_fail_and_recover(self):
        scfg = SceneConfig()
        scene = PlanarScene(scfg, plane_depth=8.0, seed=2)
        cfg = small_cfg()
        cam = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                          width=scfg.width, height=scfg.height)
        state = tracker.init_state(cfg)
        R0, t0 = orbit_trajectory(1)[0]
        img_l, img_r, _ = scene.render(R0, t0)
        state, out = tracker.track_frame(cfg, cam, state, jnp.asarray(img_l), jnp.asarray(img_r))
        assert int(out.status) == tracker.STATUS_TRACKING
        T_before = np.asarray(state.T_c_w.t).copy()
        # First blank frame: ESCAPED (two-strike entry, f2f_tracking.cpp:
        # 233-247) — still Tracking, pose chain untouched.
        blank = jnp.zeros_like(jnp.asarray(img_l))
        state, out = tracker.track_frame(cfg, cam, state, blank, blank)
        assert int(out.status) == tracker.STATUS_TRACKING
        assert int(state.fail_count) == 1
        np.testing.assert_array_equal(np.asarray(state.T_c_w.t), T_before)
        # Second consecutive blank: FAIL.
        state, out = tracker.track_frame(cfg, cam, state, blank, blank)
        assert int(out.status) == tracker.STATUS_FAIL
        # Next good frame re-initialises; the FIRST recovery attempt flags a
        # backend reset (subsequent alternate — reset thinning).
        state, out = tracker.track_frame(cfg, cam, state, jnp.asarray(img_l), jnp.asarray(img_r))
        assert int(out.status) == tracker.STATUS_TRACKING
        assert bool(out.reset_backend)
        assert bool(out.is_keyframe)

    def test_single_bad_frame_does_not_fail_or_reset(self):
        """One corrupted frame mid-run must not enter FAIL (and therefore
        never wipes the BA window): the frame is escaped and the next good
        frame continues tracking on the surviving landmark table."""
        scfg = SceneConfig()
        scene = PlanarScene(scfg, plane_depth=8.0, seed=2)
        cfg = small_cfg()
        cam = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                          width=scfg.width, height=scfg.height)
        state = tracker.init_state(cfg)
        poses = orbit_trajectory(4, step=0.02)
        for (R, t) in poses:
            il, ir, _ = scene.render(R, t)
            state, out = tracker.track_frame(cfg, cam, state,
                                             jnp.asarray(il), jnp.asarray(ir))
        n3d_before = int(np.asarray(state.table.has_3d & state.table.active).sum())
        blank = jnp.zeros((scfg.height, scfg.width), jnp.float32)
        state, out = tracker.track_frame(cfg, cam, state, blank, blank)
        assert int(out.status) == tracker.STATUS_TRACKING
        assert not bool(out.reset_backend)
        # Table survived the escape.
        n3d = int(np.asarray(state.table.has_3d & state.table.active).sum())
        assert n3d == n3d_before
        # Next good frame: normal tracking, no re-init keyframe burst, and
        # the failure strike is cleared.
        il, ir, _ = scene.render(*poses[-1])
        state, out = tracker.track_frame(cfg, cam, state,
                                         jnp.asarray(il), jnp.asarray(ir))
        assert int(out.status) == tracker.STATUS_TRACKING
        assert not bool(out.reset_backend)
        assert int(state.fail_count) == 0
        assert int(out.num_inliers) >= cfg.min_inliers

    def test_pnp_rescue_survives_abrupt_motion(self):
        """A catastrophically wrong pose prior (25° yaw + 3 m offset) starves
        the prior-seeded motion BA; the prior-free PnP RANSAC fallback
        (lkorb_tracking.cpp:161-200 role) recovers the true pose from the
        surviving LK matches and keeps STATUS_TRACKING."""
        from flvis_tpu.geometry import se3

        scfg = SceneConfig()
        scene = PlanarScene(scfg, plane_depth=8.0, seed=2)
        cam = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                          width=scfg.width, height=scfg.height)

        def run(pnp_fallback):
            cfg = small_cfg(pnp_fallback=pnp_fallback)
            state = tracker.init_state(cfg)
            poses = orbit_trajectory(4, step=0.02)
            for (R, t) in poses:
                il, ir, _ = scene.render(R, t)
                state, out = tracker.track_frame(
                    cfg, cam, state, jnp.asarray(il), jnp.asarray(ir))
            R_last, t_last = poses[-1]
            T_true = se3.SE3(so3.from_matrix(jnp.asarray(R_last, jnp.float32)),
                             jnp.asarray(t_last, jnp.float32))
            T_next = se3.SE3(T_true.q, T_true.t + jnp.asarray([0.05, 0.0, 0.0]))
            Rn = np.asarray(so3.to_matrix(T_next.q))
            il, ir, _ = scene.render(Rn, np.asarray(T_next.t))
            T_bad = se3.compose(
                se3.SE3(so3.exp(jnp.asarray([0.0, np.deg2rad(25.0), 0.0])),
                        jnp.asarray([3.0, 0.0, 0.0], jnp.float32)), T_next)
            state, out = tracker.track_frame(
                cfg, cam, state, jnp.asarray(il), jnp.asarray(ir),
                prior_T=T_bad, use_prior=True)
            C_gt = -Rn.T @ np.asarray(T_next.t)
            R_e = np.asarray(so3.to_matrix(out.T_c_w.q))
            C_e = -R_e.T @ np.asarray(out.T_c_w.t)
            return out, float(np.linalg.norm(C_gt - C_e))

        out_no, _ = run(False)
        assert int(out_no.num_inliers) < 10          # BA starved
        out_yes, err = run(True)
        assert int(out_yes.status) == tracker.STATUS_TRACKING
        assert int(out_yes.num_inliers) >= 15
        assert err < 0.05, err


class TestDepthMode:
    def test_rgbd_tracking(self):
        """D435I_DEPTH-style mode: gray + depth image instead of stereo."""
        scfg = SceneConfig()
        scene = PlanarScene(scfg, plane_depth=8.0, seed=5)
        poses = orbit_trajectory(12, step=0.03)
        cfg = small_cfg(depth_mode=True)
        cam = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, baseline=0.0,
                          depth_factor=1000.0, width=scfg.width, height=scfg.height)
        state = tracker.init_state(cfg)
        errs = []
        for (R, t) in poses:
            img_l, _, depth = scene.render(R, t)
            d_img = (depth * 1000.0).astype(np.float32)  # Z16 millimetres
            state, out = tracker.track_frame(cfg, cam, state, jnp.asarray(img_l),
                                             jnp.asarray(d_img))
            C_gt = -R.T @ t
            R_e = np.asarray(so3.to_matrix(out.T_c_w.q))
            C_e = -R_e.T @ np.asarray(out.T_c_w.t)
            errs.append(np.linalg.norm(C_gt - C_e))
        assert int(out.status) == tracker.STATUS_TRACKING
        ate = np.sqrt(np.mean(np.square(errs)))
        assert ate < 0.02, f"RGB-D ATE {ate:.4f} m"


class TestTriangulationDepth:
    def test_measure_depth_falls_back_to_triangulation(self):
        """With a blank right image (stereo fails), _measure_depth must
        recover depth by motion triangulation from the first-observation
        records once the baseline gate passes — the reference's
        recover3DPts_c_FromTriangulation path."""
        import dataclasses as dc

        from flvis_tpu.frontend import landmark_table as lt_mod
        from flvis_tpu.ops import image as imops

        scfg = SceneConfig()
        cfg = small_cfg(tri_min_baseline=0.15)
        cam = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                          width=scfg.width, height=scfg.height)
        rng = np.random.default_rng(0)
        n = 32
        pts_w = rng.uniform([-2, -2, 6], [2, 2, 10], (n, 3)).astype(np.float32)
        T0 = se3.identity()
        T1 = se3.SE3(so3.identity(), jnp.asarray([-0.3, 0.0, 0.0]))  # 0.3 m baseline
        uv0 = camera.project(cam, se3.transform_points(T0, jnp.asarray(pts_w)))
        uv1 = camera.project(cam, se3.transform_points(T1, jnp.asarray(pts_w)))

        table = lt_mod.empty(n)
        table = dc.replace(
            table,
            uv=uv1, active=jnp.ones(n, bool),
            obs0_uv=uv0,
            obs0_q=jnp.broadcast_to(T0.q, (n, 4)),
            obs0_t=jnp.broadcast_to(T0.t, (n, 3)),
        )
        blank = imops.build_grad_pyramid(jnp.zeros((scfg.height, scfg.width)), 3)
        z, ok, st_ok = tracker._measure_depth(cfg, cam, blank, blank, None, table, T1)
        assert not bool(jnp.any(st_ok))  # triangulated depth is never a stereo anchor
        okn = np.asarray(ok)
        assert okn.sum() > 25, okn.sum()
        z_true = np.asarray(se3.transform_points(T1, jnp.asarray(pts_w)))[:, 2]
        np.testing.assert_allclose(np.asarray(z)[okn], z_true[okn], rtol=0.02)


class TestRotationDominant:
    def test_yaw_sweep_tracks_and_triggers_rotation_keyframes(self):
        """Pure-yaw motion: rotation accuracy and the ‖log R‖ ≥ kf_min_rot
        keyframe gate (translation stays ~0 so only rotation can trigger
        non-bootstrap keyframes)."""
        scfg = SceneConfig()
        scene = PlanarScene(scfg, plane_depth=8.0, seed=12)
        cfg = small_cfg(kf_min_rot=0.1, kf_bootstrap_frames=0)
        cam = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                          width=scfg.width, height=scfg.height)
        state = tracker.init_state(cfg)
        n = 16
        yaw_step = 0.02
        kfs = 0
        for i in range(n):
            yaw = yaw_step * i
            cy, sy = np.cos(yaw), np.sin(yaw)
            R_w_c = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
            R = R_w_c.T
            t = np.zeros(3)
            img_l, img_r, _ = scene.render(R, t)
            state, out = tracker.track_frame(cfg, cam, state, jnp.asarray(img_l),
                                             jnp.asarray(img_r))
            kfs += int(out.is_keyframe)
            # Rotation error vs ground truth.
            q_gt = so3.from_matrix(jnp.asarray(R, jnp.float32))
            dq = so3.mul(so3.conj(out.T_c_w.q), q_gt)
            r_err = float(jnp.linalg.norm(so3.log(dq)))
            assert r_err < 0.01, (i, r_err)
            assert float(jnp.linalg.norm(out.T_c_w.t)) < 0.05
        assert int(out.status) == tracker.STATUS_TRACKING
        # 0.32 rad total sweep with a 0.1 rad gate → ≥ 3 rotation keyframes
        # (plus the init frame).
        assert kfs >= 3, kfs


class TestScanPath:
    def test_scan_matches_sequential(self):
        """track_frames_scan is bitwise-equivalent to per-frame track_frame."""
        import jax

        from flvis_tpu.io.synthetic import PlanarScene, SceneConfig, orbit_trajectory

        cfg = FrontendConfig(width=256, height=192, num_slots=64,
                             pyramid_levels=3, per_cell=4, min_distance=10.0,
                             margin=12, lk_radius=7, ransac_hypotheses=32)
        scfg = SceneConfig(width=256, height=192, fx=200.0, fy=200.0,
                           cx=128.0, cy=96.0, baseline=0.12)
        scene = PlanarScene(scfg, plane_depth=8.0, seed=2)
        cam = camera.make(200.0, 200.0, 128.0, 96.0, 0.12, width=256, height=192)
        poses = orbit_trajectory(6, step=0.03)
        frames = [scene.render(R, t) for (R, t) in poses]
        imgs0 = jnp.stack([jnp.asarray(f[0]) for f in frames])
        imgs1 = jnp.stack([jnp.asarray(f[1]) for f in frames])

        st_seq = tracker.init_state(cfg)
        outs = []
        for i in range(6):
            st_seq, o = tracker.track_frame(cfg, cam, st_seq, imgs0[i], imgs1[i])
            outs.append(o)
        st_scan, out_scan = tracker.track_frames_scan(
            cfg, cam, tracker.init_state(cfg), imgs0, imgs1)

        np.testing.assert_array_equal(np.asarray(out_scan.status),
                                      np.asarray([int(o.status) for o in outs]))
        np.testing.assert_allclose(np.asarray(out_scan.T_c_w.t),
                                   np.stack([np.asarray(o.T_c_w.t) for o in outs]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(st_scan.T_c_w.t),
                                   np.asarray(st_seq.T_c_w.t), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(st_scan.table.lm_id),
                                      np.asarray(st_seq.table.lm_id))
