"""Tests for the visualization parity layer (cv_draw / PCL voxel grid /
OctomapFeeder / RViz marker equivalents)."""

import numpy as np
import jax.numpy as jnp
import pytest

from flvis_tpu.geometry import camera, se3 as se3m, so3
from flvis_tpu.viz import cloud, overlay


def test_voxel_downsample_merges_within_leaf():
    # Two tight clusters far apart + one invalid point.
    pts = np.asarray(
        [[0.01, 0.01, 0.01], [0.02, 0.02, 0.02], [0.03, 0.01, 0.02],
         [5.0, 5.0, 5.0], [5.01, 5.01, 5.01],
         [99.0, 99.0, 99.0]], np.float32)
    mask = np.asarray([1, 1, 1, 1, 1, 0], bool)
    out, out_mask = cloud.voxel_downsample(jnp.asarray(pts), jnp.asarray(mask),
                                           leaf=0.08)
    got = np.asarray(out)[np.asarray(out_mask)]
    assert len(got) == 2
    got = got[np.argsort(got[:, 0])]
    np.testing.assert_allclose(got[0], pts[:3].mean(0), atol=1e-5)
    np.testing.assert_allclose(got[1], pts[3:5].mean(0), atol=1e-5)


def test_voxel_downsample_negative_coords():
    pts = np.asarray([[-0.01, -0.01, -0.01], [-0.02, -0.02, -0.02],
                      [0.5, 0.5, 0.5]], np.float32)
    mask = np.ones(3, bool)
    out, out_mask = cloud.voxel_downsample(jnp.asarray(pts), jnp.asarray(mask),
                                           leaf=0.08)
    assert int(np.asarray(out_mask).sum()) == 2


def test_sparse_map_recorder_latest_position_wins(tmp_path):
    rec = cloud.SparseMapRecorder(leaf=0.05)
    rec.add_correction(np.asarray([100, 101]),
                       np.asarray([[0, 0, 1.0], [3, 0, 1.0]]),
                       np.asarray([True, True]))
    # Update landmark 100 to a new position (BA correction).
    rec.add_correction(np.asarray([100]), np.asarray([[10.0, 0, 1.0]]),
                       np.asarray([True]))
    pts = rec.cloud()
    assert len(pts) == 2
    assert np.any(np.linalg.norm(pts - np.asarray([10.0, 0, 1.0]), axis=1) < 1e-4)
    n = rec.save_ply(str(tmp_path / "map.ply"))
    assert n == 2
    header = (tmp_path / "map.ply").read_text().splitlines()
    assert header[0] == "ply" and "element vertex 2" in header


def test_depth_band_cloud_range_gate():
    cam = camera.make(100.0, 100.0, 64.0, 48.0, baseline=0.1,
                      depth_factor=1000.0, width=128, height=96)
    d = np.full((96, 128), 2000.0, np.float32)     # 2 m everywhere
    d[:, :64] = 20000.0                            # left half out of range (20 m)
    T = se3m.identity()
    pts_c, pts_w, ok = cloud.depth_band_cloud(cam, d, T, step=7, lines=3)
    ok = np.asarray(ok)
    assert ok.any() and not ok.all()
    z = np.asarray(pts_c)[ok, 2]
    np.testing.assert_allclose(z, 2.0, atol=1e-5)
    # Identity pose: world == camera frame.
    np.testing.assert_allclose(np.asarray(pts_w)[ok], np.asarray(pts_c)[ok],
                               atol=1e-5)


def test_camera_pyramid_and_marker_ply(tmp_path):
    q = so3.exp(jnp.asarray([0.0, 0.3, 0.0]))
    T_c_w = se3m.SE3(q, jnp.asarray([0.5, 0.0, 1.0]))
    verts, edges = cloud.camera_pyramid_segments(T_c_w)
    assert verts.shape == (5, 3) and edges.shape == (8, 2)
    # Apex is the camera centre.
    C = np.asarray(se3m.inverse(T_c_w).t)
    np.testing.assert_allclose(verts[0], C, atol=1e-6)
    lm = np.asarray([[0, 0, 5.0], [1, 1, 5.0]], np.float32)
    cloud.save_frame_marker_ply(str(tmp_path / "frame.ply"), T_c_w, lm,
                                np.asarray([True, False]))
    text = (tmp_path / "frame.ply").read_text()
    assert "element vertex 8" in text and "element edge 9" in text


def test_overlay_draw_frame_colors():
    img = overlay.to_rgb(np.zeros((96, 128), np.float32))
    uv = np.asarray([[20.0, 30.0], [100.0, 60.0], [500.0, 500.0]])
    z = np.asarray([0.5, 10.0, 3.0])
    mask = np.asarray([True, True, True])
    out = overlay.draw_frame(img, uv, z, mask, fps=100.0, reproj_err=0.42)
    # Near point red-dominant, far point blue-dominant (cv_draw.h ramp).
    assert out[30, 20, 0] > 200 and out[30, 20, 2] < 50
    assert out[60, 100, 2] > 200 and out[60, 100, 0] < 50
    # Grid lines drawn white.
    assert (out[96 // 4, 5] == 255).all()
    # Out-of-bounds point must not crash or wrap.
    assert out.shape == (96, 128, 3)


def test_overlay_flow_and_depth_vis():
    img = overlay.to_rgb(np.zeros((64, 64), np.float32))
    f = np.asarray([[10.0, 10.0]])
    t = np.asarray([[20.0, 20.0]])
    out = overlay.draw_flow(img, f, t, np.asarray([True]))
    assert out.sum() > 0
    d = np.full((32, 32), 5000.0, np.float32)
    d[0, 0] = 50.0   # below min_raw -> invalid -> white
    vis = overlay.visualize_depth(d)
    assert vis.shape == (32, 32, 3)
    assert (vis[0, 0] == 255).all()
    assert not (vis[16, 16] == 255).all()
