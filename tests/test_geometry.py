"""Unit tests for the SO3/SE3/camera/triangulation layer against scipy/numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from flvis_tpu.geometry import camera, se3, so3, triangulation


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return q * np.where(q[:, :1] < 0, -1.0, 1.0)


def to_scipy(q_wxyz):
    return Rotation.from_quat(np.roll(np.asarray(q_wxyz), -1, axis=-1))  # scipy is xyzw


class TestSO3:
    def test_mul_matches_scipy(self, rng):
        a, b = random_quats(rng, 64), random_quats(rng, 64)
        got = so3.to_matrix(so3.mul(jnp.asarray(a), jnp.asarray(b)))
        want = (to_scipy(a) * to_scipy(b)).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_rotate_matches_matrix(self, rng):
        q = jnp.asarray(random_quats(rng, 32))
        v = jnp.asarray(rng.normal(size=(32, 3)))
        np.testing.assert_allclose(
            so3.rotate(q, v), jnp.einsum("nij,nj->ni", so3.to_matrix(q), v), atol=1e-5
        )

    def test_matrix_roundtrip(self, rng):
        q = random_quats(rng, 128)
        q2 = so3.from_matrix(so3.to_matrix(jnp.asarray(q)))
        np.testing.assert_allclose(np.abs(np.sum(q * np.asarray(q2), axis=-1)), 1.0, atol=1e-5)

    def test_exp_log_roundtrip(self, rng):
        phi = rng.normal(size=(64, 3))
        phi = phi / np.linalg.norm(phi, axis=-1, keepdims=True) * rng.uniform(0, 3.0, size=(64, 1))
        np.testing.assert_allclose(so3.log(so3.exp(jnp.asarray(phi))), phi, atol=1e-5)

    def test_exp_small_angle(self):
        phi = jnp.asarray([[1e-10, 0, 0], [0.0, 0, 0]])
        q = so3.exp(phi)
        np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-6)
        np.testing.assert_allclose(so3.log(q), phi, atol=1e-8)

    def test_exp_matches_scipy(self, rng):
        phi = rng.normal(size=(32, 3))
        got = so3.to_matrix(so3.exp(jnp.asarray(phi)))
        want = Rotation.from_rotvec(phi).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_euler_roundtrip(self, rng):
        rpy = rng.uniform(-1.0, 1.0, size=(32, 3))
        np.testing.assert_allclose(so3.to_euler_zyx(so3.from_euler_zyx(jnp.asarray(rpy))), rpy, atol=1e-5)

    def test_euler_matches_scipy(self, rng):
        rpy = rng.uniform(-1.0, 1.0, size=(16, 3))
        got = so3.to_matrix(so3.from_euler_zyx(jnp.asarray(rpy)))
        want = Rotation.from_euler("ZYX", rpy[:, ::-1]).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_grad_safe_at_identity(self):
        g = jax.grad(lambda p: jnp.sum(so3.exp(p)))(jnp.zeros(3))
        assert np.all(np.isfinite(g))


class TestSE3:
    def make(self, rng, n):
        return se3.SE3(jnp.asarray(random_quats(rng, n)), jnp.asarray(rng.normal(size=(n, 3))))

    def test_compose_inverse(self, rng):
        T = self.make(rng, 16)
        I = se3.compose(T, se3.inverse(T))
        np.testing.assert_allclose(I.t, 0.0, atol=1e-5)
        np.testing.assert_allclose(np.abs(I.q[:, 0]), 1.0, atol=1e-5)

    def test_matrix_roundtrip(self, rng):
        T = self.make(rng, 16)
        M = se3.to_matrix(T)
        T2 = se3.from_matrix(M)
        np.testing.assert_allclose(se3.to_matrix(T2), M, atol=1e-5)

    def test_compose_matches_matrix(self, rng):
        a, b = self.make(rng, 8), self.make(rng, 8)
        np.testing.assert_allclose(
            se3.to_matrix(se3.compose(a, b)),
            np.einsum("nij,njk->nik", se3.to_matrix(a), se3.to_matrix(b)),
            atol=1e-5,
        )

    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(32, 6))
        # Keep the rotation part inside the principal branch (|phi| < pi).
        xi[:, 3:] *= 0.9
        np.testing.assert_allclose(se3.log(se3.exp(jnp.asarray(xi))), xi, atol=1e-4)

    def test_transform_points(self, rng):
        T = self.make(rng, 1)
        T1 = se3.index(T, 0)
        pts = jnp.asarray(rng.normal(size=(20, 3)))
        got = se3.transform_points(T1, pts)
        M = np.asarray(se3.to_matrix(T1))
        want = pts @ M[:3, :3].T + M[:3, 3]
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_distance(self):
        a = se3.identity()
        b = se3.SE3(so3.exp(jnp.asarray([0.0, 0.0, 0.3])), jnp.asarray([1.0, 0, 0]))
        dt, dr = se3.distance(a, b)
        np.testing.assert_allclose(dt, 1.0, atol=1e-6)
        np.testing.assert_allclose(dr, 0.3, atol=1e-6)


class TestCamera:
    def cam(self):
        return camera.make(458.0, 457.0, 367.2, 248.3, baseline=0.11, width=752, height=480)

    def test_project_backproject(self, rng):
        cam = self.cam()
        pts = jnp.asarray(rng.uniform(0.5, 10.0, size=(50, 3)) * np.array([0.3, 0.3, 1.0]))
        uv = camera.project(cam, pts)
        back = camera.backproject(cam, uv, pts[:, 2])
        np.testing.assert_allclose(back, pts, rtol=1e-5)

    def test_stereo_disparity(self, rng):
        cam = self.cam()
        pts = jnp.asarray([[0.5, 0.2, 4.0]])
        ulvr = camera.project_stereo(cam, pts)
        z = camera.disparity_to_depth(cam, ulvr[:, 0] - ulvr[:, 2])
        np.testing.assert_allclose(z, 4.0, rtol=1e-5)

    def test_world_roundtrip(self, rng):
        cam = self.cam()
        T = se3.SE3(jnp.asarray(random_quats(rng, 1)[0]), jnp.asarray([0.1, -0.2, 0.3]))
        pts_w = jnp.asarray(rng.normal(size=(10, 3)))
        pc = camera.world_to_cam(T, pts_w)
        np.testing.assert_allclose(camera.cam_to_world(T, pc), pts_w, atol=1e-5)


class TestTriangulation:
    def test_two_view_exact(self, rng):
        pts_w = rng.uniform(-1, 1, size=(40, 3)) + np.array([0, 0, 5.0])
        T0 = se3.identity()
        T1 = se3.SE3(so3.exp(jnp.asarray([0.0, 0.05, 0.0])), jnp.asarray([-0.5, 0.0, 0.0]))
        pc0 = se3.transform_points(T0, jnp.asarray(pts_w))
        pc1 = se3.transform_points(T1, jnp.asarray(pts_w))
        xn0 = pc0[:, :2] / pc0[:, 2:]
        xn1 = pc1[:, :2] / pc1[:, 2:]
        got, ok = triangulation.triangulate_dlt(T0, T1, xn0, xn1)
        assert np.all(np.asarray(ok))
        np.testing.assert_allclose(got, pts_w, atol=1e-2)

    def test_rectified_depth(self):
        z, ok = triangulation.stereo_rectified_depth(458.0, 0.11, jnp.asarray([400.0]), jnp.asarray([400.0 - 458.0 * 0.11 / 3.0]))
        assert bool(ok[0])
        np.testing.assert_allclose(z, 3.0, rtol=1e-5)

    def test_from_views_gates(self, rng):
        # Point behind the camera must be flagged invalid.
        T0 = se3.identity()
        T1 = se3.SE3(so3.identity(), jnp.asarray([-0.5, 0.0, 0.0]))
        pt = jnp.asarray([[0.0, 0.0, -3.0]])
        xn0 = pt[:, :2] / pt[:, 2:]
        xn1_pt = se3.transform_points(T1, pt)
        xn1 = xn1_pt[:, :2] / xn1_pt[:, 2:]
        _, valid = triangulation.triangulate_from_views(T0, T1, xn0, xn1)
        assert not bool(valid[0])
