"""Motion-only BA: recover a known pose from noisy/outlier-laden observations."""

import jax.numpy as jnp
import numpy as np

from flvis_tpu.backend import motion_ba
from flvis_tpu.geometry import camera, se3, so3


def make_problem(rng, n=120, noise=0.3, outlier_frac=0.0, perturb=(0.1, 0.05)):
    cam = camera.make(400.0, 400.0, 256.0, 192.0, baseline=0.2, width=512, height=384)
    pts_w = jnp.asarray(rng.uniform([-3, -3, 4], [3, 3, 12], size=(n, 3)))
    T_true = se3.SE3(so3.exp(jnp.asarray([0.03, -0.05, 0.02])), jnp.asarray([0.2, -0.1, 0.3]))
    uv = camera.project(cam, se3.transform_points(T_true, pts_w))
    uv = uv + rng.normal(scale=noise, size=uv.shape)
    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        uv = np.array(uv)
        uv[idx] += rng.uniform(20, 80, size=(n_out, 2)) * rng.choice([-1, 1], size=(n_out, 2))
        uv = jnp.asarray(uv)
    dt = se3.exp(jnp.asarray(list(rng.normal(scale=perturb[0], size=3)) + list(rng.normal(scale=perturb[1], size=3))))
    T_init = se3.compose(dt, T_true)
    return cam, T_true, T_init, pts_w, uv


def pose_error(T_est, T_true):
    dt, dr = se3.distance(T_est, T_true)
    return float(dt), float(dr)


class TestMotionBA:
    def test_clean_convergence(self, rng):
        cam, T_true, T_init, pts_w, uv = make_problem(rng, noise=0.0)
        res = motion_ba.optimize_pose(cam, T_init, pts_w, uv, jnp.ones(len(pts_w), bool))
        dt, dr = pose_error(res.T_c_w, T_true)
        assert dt < 1e-3 and dr < 1e-4
        assert int(res.num_inliers) == len(pts_w)

    def test_noisy_convergence(self, rng):
        cam, T_true, T_init, pts_w, uv = make_problem(rng, noise=0.5)
        res = motion_ba.optimize_pose(cam, T_init, pts_w, uv, jnp.ones(len(pts_w), bool))
        dt, dr = pose_error(res.T_c_w, T_true)
        assert dt < 0.02 and dr < 0.005

    def test_outlier_robustness(self, rng):
        cam, T_true, T_init, pts_w, uv = make_problem(rng, noise=0.3, outlier_frac=0.25)
        res = motion_ba.optimize_pose(cam, T_init, pts_w, uv, jnp.ones(len(pts_w), bool))
        dt, dr = pose_error(res.T_c_w, T_true)
        assert dt < 0.03 and dr < 0.01
        # The chi² cull should reject most injected outliers.
        assert int(res.num_inliers) < len(pts_w)

    def test_too_few_points_returns_init(self, rng):
        cam, T_true, T_init, pts_w, uv = make_problem(rng)
        valid = jnp.zeros(len(pts_w), bool).at[:5].set(True)
        res = motion_ba.optimize_pose(cam, T_init, pts_w, uv, valid)
        np.testing.assert_allclose(res.T_c_w.t, T_init.t, atol=1e-6)

    def test_respects_valid_mask(self, rng):
        cam, T_true, T_init, pts_w, uv = make_problem(rng, noise=0.0)
        # Corrupt half the observations but mark them invalid.
        uv = np.array(uv)
        uv[::2] += 500.0
        valid = jnp.asarray(np.arange(len(pts_w)) % 2 == 1)
        res = motion_ba.optimize_pose(cam, T_init, pts_w, jnp.asarray(uv), valid)
        dt, dr = pose_error(res.T_c_w, T_true)
        assert dt < 1e-3
