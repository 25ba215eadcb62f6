"""Dataset drivers, trajectory I/O and evaluation metrics on tiny fixtures."""

import os

import numpy as np
import pytest

from flvis_tpu.io import trajectory
from flvis_tpu.utils import evaluation


class TestTrajectoryIO:
    def test_tum_roundtrip(self, tmp_path, rng):
        n = 10
        ts = np.arange(n) * 0.05
        pos = rng.normal(size=(n, 3))
        q = rng.normal(size=(n, 4))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        p = tmp_path / "traj.tum"
        trajectory.write_tum(p, ts, pos, q)
        t2, p2, q2 = trajectory.read_tum(p)
        np.testing.assert_allclose(t2, ts, atol=1e-9)
        np.testing.assert_allclose(p2, pos, atol=1e-5)
        np.testing.assert_allclose(q2, q, atol=1e-5)

    def test_kitti_roundtrip(self, tmp_path, rng):
        from scipy.spatial.transform import Rotation
        n = 5
        poses = np.tile(np.eye(4), (n, 1, 1))
        poses[:, :3, :3] = Rotation.random(n, rng).as_matrix()
        poses[:, :3, 3] = rng.normal(size=(n, 3))
        p = tmp_path / "traj.kitti"
        trajectory.write_kitti(p, poses)
        back = trajectory.read_kitti(p)
        np.testing.assert_allclose(back, poses, atol=1e-5)


class TestEvaluation:
    def test_umeyama_recovers_transform(self, rng):
        from scipy.spatial.transform import Rotation
        src = rng.normal(size=(50, 3))
        R = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
        t = np.array([1.0, 2.0, -0.5])
        dst = src @ R.T + t
        s, R2, t2 = evaluation.umeyama_alignment(src, dst)
        np.testing.assert_allclose(R2, R, atol=1e-6)
        np.testing.assert_allclose(t2, t, atol=1e-6)

    def test_ate_zero_after_alignment(self, rng):
        from scipy.spatial.transform import Rotation
        gt = rng.normal(size=(30, 3))
        R = Rotation.from_rotvec([0.1, 0.2, 0.3]).as_matrix()
        est = gt @ R.T + np.array([5.0, -2.0, 1.0])
        rmse, err = evaluation.ate_rmse(est, gt, align=True)
        assert rmse < 1e-6

    def test_ate_detects_noise(self, rng):
        gt = np.cumsum(rng.normal(size=(100, 3)) * 0.1, axis=0)
        est = gt + rng.normal(scale=0.05, size=gt.shape)
        rmse, _ = evaluation.ate_rmse(est, gt)
        assert 0.02 < rmse < 0.2

    def test_rpe_identity(self, rng):
        n = 20
        poses = np.tile(np.eye(4), (n, 1, 1))
        poses[:, :3, 3] = np.cumsum(rng.normal(size=(n, 3)), axis=0)
        t_rmse, r_rmse = evaluation.rpe(poses, poses)
        assert t_rmse < 1e-9 and r_rmse < 1e-6

    def test_associate(self):
        ta = np.array([0.0, 0.1, 0.2, 0.3])
        tb = np.array([0.001, 0.102, 0.9])
        ia, ib = evaluation.associate(ta, tb, max_dt=0.02)
        assert list(ia) == [0, 1] and list(ib) == [0, 1]


def make_euroc_fixture(root, n_frames=4):
    import cv2
    import yaml

    mav = root / "mav0"
    for cam in ["cam0", "cam1"]:
        (mav / cam / "data").mkdir(parents=True)
        sensor = {
            "T_BS": {"data": np.eye(4).reshape(-1).tolist()},
            "intrinsics": [100.0, 100.0, 40.0, 30.0],
            "distortion_coefficients": [0.0, 0.0, 0.0, 0.0],
            "resolution": [80, 60],
        }
        if cam == "cam1":
            T = np.eye(4)
            T[0, 3] = 0.1  # cam1 0.1 m to the right of cam0 (T_BS maps cam→body)
            sensor["T_BS"]["data"] = T.reshape(-1).tolist()
        with open(mav / cam / "sensor.yaml", "w") as f:
            yaml.dump(sensor, f)
    rng = np.random.default_rng(0)
    ts = (1e9 * (100.0 + 0.05 * np.arange(n_frames))).astype(np.int64)
    for cam in ["cam0", "cam1"]:
        with open(mav / cam / "data.csv", "w") as f:
            f.write("#timestamp [ns],filename\n")
            for t in ts:
                f.write(f"{t},{t}.png\n")
                img = rng.integers(0, 255, (60, 80), np.uint8)
                cv2.imwrite(str(mav / cam / "data" / f"{t}.png"), img)
    (mav / "imu0").mkdir(parents=True)
    with open(mav / "imu0" / "data.csv", "w") as f:
        f.write("#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n")
        for i in range(n_frames * 10):
            t = int(1e9 * (100.0 + 0.005 * i))
            f.write(f"{t},0.0,0.0,0.0,0.0,0.0,9.81\n")
    gdir = mav / "state_groundtruth_estimate0"
    gdir.mkdir(parents=True)
    with open(gdir / "data.csv", "w") as f:
        f.write("#t,px,py,pz,qw,qx,qy,qz\n")
        for t in ts:
            f.write(f"{t},0,0,0,1,0,0,0\n")
    return root


class TestEurocDriver:
    def test_reads_fixture(self, tmp_path):
        from flvis_tpu.io.euroc import EurocDataset

        make_euroc_fixture(tmp_path)
        ds = EurocDataset(str(tmp_path))
        assert len(ds) == 4
        assert abs(float(ds.camera.baseline) - 0.1) < 1e-6
        frames = list(ds.frames())
        assert len(frames) == 4
        f = frames[1]
        assert f.img0.shape == (60, 80)
        assert f.imu_t.shape[0] == 10  # 200 Hz IMU / 20 Hz frames
        assert ds.gt_pos.shape == (4, 3)


def make_kitti_fixture(root, n=3):
    import cv2

    (root / "image_0").mkdir(parents=True)
    (root / "image_1").mkdir(parents=True)
    with open(root / "calib.txt", "w") as f:
        f.write("P0: 100 0 40 0 0 100 30 0 0 0 1 0\n")
        f.write("P1: 100 0 40 -10 0 100 30 0 0 0 1 0\n")
    np.savetxt(root / "times.txt", 0.1 * np.arange(n))
    rng = np.random.default_rng(1)
    for i in range(n):
        for d in ["image_0", "image_1"]:
            cv2.imwrite(str(root / d / f"{i:06d}.png"),
                        rng.integers(0, 255, (60, 80), np.uint8))
    poses = np.tile(np.eye(4)[:3], (n, 1, 1)).reshape(n, -1)
    np.savetxt(root / "poses.txt", poses)
    return root


class TestKittiDriver:
    def test_reads_fixture(self, tmp_path):
        from flvis_tpu.io.kitti import KittiDataset

        make_kitti_fixture(tmp_path)
        ds = KittiDataset(str(tmp_path), poses_file=str(tmp_path / "poses.txt"))
        assert len(ds) == 3
        assert abs(float(ds.camera.baseline) - 0.1) < 1e-6
        frames = list(ds.frames())
        assert len(frames) == 3
        assert frames[0].img0.shape == (60, 80)
        assert ds.gt_poses.shape == (3, 4, 4)


class TestNativeLoader:
    def test_decode_matches_cv2(self, tmp_path, rng):
        import cv2
        from flvis_tpu.io import native_loader as nl

        if not nl.available():
            import pytest
            pytest.skip("native loader not built")
        img = rng.integers(0, 255, (48, 64), np.uint8)
        p = str(tmp_path / "t.png")
        cv2.imwrite(p, img)
        got = nl.decode_png_gray(p)
        np.testing.assert_allclose(got, img.astype(np.float32))

    def test_kitti_native_path(self, tmp_path):
        from flvis_tpu.io import native_loader as nl
        from flvis_tpu.io.kitti import KittiDataset

        if not nl.available():
            import pytest
            pytest.skip("native loader not built")
        make_kitti_fixture(tmp_path)
        ds = KittiDataset(str(tmp_path))
        native = [f.img0 for f in ds.frames(use_native=True)]
        cv_ = [f.img0 for f in ds.frames(use_native=False)]
        assert len(native) == len(cv_) == 3
        for a, b in zip(native, cv_):
            np.testing.assert_allclose(a, b)


class TestYamlConfig:
    def test_load_reference_style_yaml(self, tmp_path):
        import yaml as pyyaml

        from flvis_tpu.config import load_yaml

        y = {
            "type_of_vi": 1, "image_width": 752, "image_height": 480,
            "feature_para1": 12, "feature_para3": 18.0, "feature_para5": 0.02,
            "vifusion_para1": 0.08, "vifusion_para2": 0.1,
            "dr_para1": 0.25, "dr_para2": 50.0, "dr_para3": 0,
            "window_size": 250,  # clamped to 100 like the reference
            "lcKFStart": 30, "lcKFDist": 40, "ratioMax": 0.8, "minPts": 20,
        }
        p = tmp_path / "cfg.yaml"
        with open(p, "w") as f:
            pyyaml.dump(y, f)
        cfg = load_yaml(str(p))
        assert cfg.vi_type == 1
        assert cfg.frontend.width == 752 and cfg.frontend.per_cell == 12
        assert abs(cfg.frontend.iir_ratio - 0.25) < 1e-9
        assert abs(cfg.vio.madgwick_beta - 0.08) < 1e-9
        assert cfg.backend.window_size == 100  # clamp
        assert cfg.loop.kf_start == 30 and cfg.loop.min_pts == 20


class TestNativeOutOfOrder:
    def test_many_frames_many_threads_no_deadlock(self, tmp_path, rng):
        """Out-of-order worker completion must not deadlock the prefetcher
        (a FIFO-with-re-push design busy-spun holding the mutex)."""
        import cv2
        from flvis_tpu.io import native_loader as nl

        if not nl.available():
            import pytest
            pytest.skip("native loader not built")
        paths = []
        for i in range(40):
            p = str(tmp_path / f"{i:03d}.png")
            cv2.imwrite(p, rng.integers(0, 255, (32, 48), np.uint8))
            paths.append(p)
        pf = nl.StereoPrefetcher(paths, paths, 48, 32, num_threads=4)
        frames = list(pf)
        pf.close()
        assert len(frames) == 40

    def test_bad_frame_skipped_not_truncated(self, tmp_path, rng):
        import cv2
        from flvis_tpu.io import native_loader as nl

        if not nl.available():
            import pytest
            pytest.skip("native loader not built")
        paths = []
        for i in range(6):
            p = str(tmp_path / f"{i}.png")
            cv2.imwrite(p, rng.integers(0, 255, (32, 48), np.uint8))
            paths.append(p)
        with open(paths[2], "wb") as f:
            f.write(b"not a png")
        pf = nl.StereoPrefetcher(paths, paths, 48, 32, num_threads=2)
        frames = list(pf)
        pf.close()
        assert len(frames) == 5  # bad frame skipped, stream continues

    def test_size_mismatch_rejected(self, tmp_path, rng):
        import cv2
        from flvis_tpu.io import native_loader as nl

        if not nl.available():
            import pytest
            pytest.skip("native loader not built")
        p = str(tmp_path / "wrong.png")
        cv2.imwrite(p, rng.integers(0, 255, (64, 96), np.uint8))  # 96x64 file
        pf = nl.StereoPrefetcher([p], [p], 48, 32, num_threads=1)  # configured 48x32
        frames = list(pf)
        pf.close()
        assert frames == []  # rejected, no heap smash


class TestYamlDepthMode:
    def test_depth_mode_derived_from_vi_type(self, tmp_path):
        import yaml as pyyaml
        from flvis_tpu.config import load_yaml

        for vi, want in [(0, True), (2, True), (1, False), (4, False)]:
            p = tmp_path / f"c{vi}.yaml"
            with open(p, "w") as f:
                pyyaml.dump({"type_of_vi": vi}, f)
            assert load_yaml(str(p)).frontend.depth_mode is want
