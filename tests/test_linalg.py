"""Tests for the closed-form / statically-unrolled linear algebra in
flvis_tpu.ops.linalg against NumPy float64 references."""

import jax.numpy as jnp
import numpy as np

from flvis_tpu.ops import linalg


def _rand_spd(rng, n, cond=1e4):
    A = rng.normal(size=(n, n))
    U, _ = np.linalg.qr(A)
    s = np.logspace(0, np.log10(cond), n)
    return (U * s) @ U.T


class TestSpd6Inv:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        M = np.stack([_rand_spd(rng, 6, cond=1e3) for _ in range(8)])
        got = np.asarray(linalg.spd6_inv(jnp.asarray(M, jnp.float32)), np.float64)
        ref = np.linalg.inv(M)
        for g, r, m in zip(got, ref, M):
            # Verify as an inverse (M @ g ≈ I), which is the well-conditioned
            # check in f32.
            np.testing.assert_allclose(m @ g, np.eye(6), atol=5e-3)


class TestBlockSpdSolve:
    def test_matches_numpy_60(self):
        rng = np.random.default_rng(1)
        S = _rand_spd(rng, 60, cond=1e4)
        b = rng.normal(size=60)
        x = np.asarray(
            linalg.block_spd_solve(jnp.asarray(S, jnp.float32),
                                   jnp.asarray(b, jnp.float32)), np.float64)
        ref = np.linalg.solve(S, b)
        # f32 forward error scales with cond; check the residual instead.
        assert np.linalg.norm(S @ x - b) / np.linalg.norm(b) < 1e-3
        np.testing.assert_allclose(x, ref, rtol=0, atol=2e-2 * np.abs(ref).max())

    def test_matrix_rhs(self):
        rng = np.random.default_rng(2)
        S = _rand_spd(rng, 12, cond=100.0)
        B = rng.normal(size=(12, 3))
        X = np.asarray(
            linalg.block_spd_solve(jnp.asarray(S, jnp.float32),
                                   jnp.asarray(B, jnp.float32)), np.float64)
        assert np.linalg.norm(S @ X - B) / np.linalg.norm(B) < 1e-4

    def test_window_ba_shape_with_gauge_block(self):
        # The window BA passes S with an identity row/col for the fixed pose
        # (gauge); the solve must behave like the dense reference there too.
        rng = np.random.default_rng(3)
        S = _rand_spd(rng, 60, cond=1e4)
        fix = np.zeros(60, bool)
        fix[:6] = True
        S[fix] = 0.0
        S[:, fix] = 0.0
        S[np.diag_indices(60)] += np.where(fix, 1.0, 1e-9)
        b = rng.normal(size=60)
        b[fix] = 0.0
        x = np.asarray(
            linalg.block_spd_solve(jnp.asarray(S, jnp.float32),
                                   jnp.asarray(b, jnp.float32)), np.float64)
        assert np.linalg.norm(S @ x - b) / np.linalg.norm(b) < 1e-3
        assert np.abs(x[:6]).max() < 1e-6
