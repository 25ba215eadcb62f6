"""Point-cloud outputs: voxel-grid sparse map, depth bands, PLY markers.

Covers the reference's point-cloud publication surfaces without ROS:

- `voxel_downsample` — the PCL VoxelGrid (0.08 m leaf) the local-map node
  applies before publishing the sparse map
  (/root/reference/src/backend/vo_localmap.cpp:367-377), as a fixed-shape
  JAX op (mask in, mask out).
- `SparseMapRecorder` — accumulates BA-corrected landmark positions by id
  (the `map` cloud the reference grows from optimized keyframes) and exports
  a voxel-downsampled PLY.
- `depth_band_cloud` — the OctomapFeeder sampling pattern: rows around the
  image centre at a fixed pixel step, range-gated, back-projected
  (/root/reference/src/octofeeder/octomap_feeder.cpp:18-80; compiled out in
  the reference build but kept for parity).
- `camera_pyramid_segments` / `landmark_segments` — the RVIZFrame marker
  geometry (camera frustum pyramid + camera→landmark line list,
  /root/reference/src/visualization/rviz_frame.cpp:60-144) as world-frame
  line segments, exportable to PLY for any mesh viewer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import camera as cam_m, se3 as se3m
from ..geometry.camera import StereoCamera
from ..geometry.se3 import SE3


# --------------------------------------------------------------------- voxel
@functools.partial(jax.jit, static_argnames=("leaf",))
def voxel_downsample(points, mask, leaf: float = 0.08):
    """Voxel-grid downsample: one centroid per occupied leaf-sized voxel.

    points (N, 3) float32 + validity mask (N,) -> (points_out (N, 3),
    mask_out (N,)) where mask_out marks one representative per voxel (the
    centroid of its members) packed at the front.  Fixed shapes throughout —
    the PCL VoxelGrid<pcl::PointXYZ> setLeafSize(0.08) equivalent
    (vo_localmap.cpp:369-371).
    """
    n = points.shape[0]
    cell = jnp.floor(points / leaf).astype(jnp.int32)
    # Invalid points go to a sentinel voxel sorted last (int32-safe: no
    # packed 64-bit key — x64 mode is off; lexicographic sort instead).
    sentinel = jnp.int32(2 ** 24)
    cell = jnp.where(mask[:, None], cell, sentinel)
    order = jnp.lexsort((cell[:, 2], cell[:, 1], cell[:, 0]))
    cell_s = cell[order]
    pts_s = points[order]
    mask_s = mask[order]
    new_seg = jnp.concatenate(
        [jnp.ones(1, bool), jnp.any(cell_s[1:] != cell_s[:-1], axis=1)])
    seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1       # (N,) 0..n-1
    w = mask_s.astype(points.dtype)
    sums = jnp.zeros((n, 3), points.dtype).at[seg_id].add(pts_s * w[:, None])
    cnts = jnp.zeros((n,), points.dtype).at[seg_id].add(w)
    centroids = sums / jnp.maximum(cnts, 1.0)[:, None]
    out_mask = cnts > 0
    return centroids, out_mask


# ----------------------------------------------------------------- PLY export
def write_ply(path: str, points, mask=None, colors=None,
              edges: np.ndarray | None = None) -> int:
    """ASCII PLY writer for points (+ optional uint8 colors and line edges).

    Replaces sensor_msgs::PointCloud2 publication as the inspectable output
    format.  Returns the number of vertices written."""
    pts = np.asarray(points, np.float32).reshape(-1, 3)
    if mask is not None:
        m = np.asarray(mask, bool).reshape(-1)
        pts = pts[m]
        if colors is not None:
            colors = np.asarray(colors).reshape(-1, 3)[m]
    n = len(pts)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        if edges is not None:
            f.write(f"element edge {len(edges)}\n")
            f.write("property int vertex1\nproperty int vertex2\n")
        f.write("end_header\n")
        for i in range(n):
            row = f"{pts[i, 0]:.4f} {pts[i, 1]:.4f} {pts[i, 2]:.4f}"
            if colors is not None:
                c = np.asarray(colors[i], np.int64)
                row += f" {c[0]} {c[1]} {c[2]}"
            f.write(row + "\n")
        if edges is not None:
            for a, b in np.asarray(edges, np.int64):
                f.write(f"{a} {b}\n")
    return n


# ------------------------------------------------------------- sparse map rec
class SparseMapRecorder:
    """Accumulates the latest BA-corrected world position per landmark id —
    the local-map node's growing `map` cloud (vo_localmap.cpp:320-377) —
    and exports it voxel-downsampled."""

    def __init__(self, leaf: float = 0.08):
        self.leaf = leaf
        self._pts: dict[int, np.ndarray] = {}

    def add_correction(self, lm_id, lm_pw, mask) -> None:
        ids = np.asarray(lm_id).reshape(-1)
        pw = np.asarray(lm_pw).reshape(-1, 3)
        m = np.asarray(mask, bool).reshape(-1)
        for k in np.flatnonzero(m):
            self._pts[int(ids[k])] = pw[k]

    def __len__(self) -> int:
        return len(self._pts)

    def cloud(self) -> np.ndarray:
        """Voxel-downsampled (M, 3) world points."""
        if not self._pts:
            return np.zeros((0, 3), np.float32)
        pts = np.asarray(list(self._pts.values()), np.float32)
        # Pad to a power-of-2 bucket to bound jit recompiles over a run.
        n = len(pts)
        n_pad = max(64, 1 << (n - 1).bit_length())
        padded = np.zeros((n_pad, 3), np.float32)
        padded[:n] = pts
        mask = np.arange(n_pad) < n
        out, out_mask = voxel_downsample(jnp.asarray(padded), jnp.asarray(mask),
                                         leaf=self.leaf)
        return np.asarray(out)[np.asarray(out_mask)]

    def save_ply(self, path: str) -> int:
        return write_ply(path, self.cloud())


# ------------------------------------------------------------ octomap feeder
def depth_band_cloud(cam: StereoCamera, d_img, T_c_w: SE3,
                     step: int = 7, lines: int = 3,
                     z_min: float = 0.5, z_max: float = 6.5):
    """Band-sampled depth cloud for occupancy mapping.

    Samples `2*lines` rows around the image centre at `step`-pixel strides,
    converts raw Z16 depth via cam.depth_factor, range-gates to
    [z_min, z_max], and returns camera-frame points, world-frame points and
    a validity mask (OctomapFeeder::pub, octomap_feeder.cpp:33-80).
    """
    d_img = jnp.asarray(d_img, jnp.float32)
    h, w = d_img.shape
    v0 = h // 2 - step * lines - 1
    vs = v0 + step * jnp.arange(2 * lines)          # static count of rows
    us = step * jnp.arange(w // step)
    uu, vv = jnp.meshgrid(us, vs, indexing="xy")
    uv = jnp.stack([uu.reshape(-1), vv.reshape(-1)], -1).astype(jnp.float32)
    raw = d_img[vv.reshape(-1), uu.reshape(-1)]
    z = raw / cam.depth_factor
    ok = jnp.isfinite(z) & (z >= z_min) & (z <= z_max)
    pts_c = cam_m.backproject(cam, uv, z)
    pts_w = se3m.transform_points(se3m.inverse(T_c_w), pts_c)
    return pts_c, pts_w, ok


# ------------------------------------------------------------- RViz markers
# Camera-frame frustum corners used by the reference's pose marker
# (rviz_frame.cpp:102-106).
_PYRAMID_C = np.asarray(
    [[0.1, 0.07, 0.07], [0.1, -0.07, 0.07], [-0.1, -0.07, 0.07],
     [-0.1, 0.07, 0.07]], np.float32)


def camera_pyramid_segments(T_c_w: SE3):
    """(P, E): world-frame frustum-pyramid vertices (5, 3) and edge index
    pairs — apex→corners + base ring (rviz_frame.cpp:100-123)."""
    T_w_c = se3m.inverse(T_c_w)
    corners = se3m.transform_points(T_w_c, jnp.asarray(_PYRAMID_C))
    apex = T_w_c.t[None, :]
    verts = np.asarray(jnp.concatenate([apex, corners], axis=0))
    edges = np.asarray([[0, 1], [0, 2], [0, 3], [0, 4],
                        [1, 2], [2, 3], [3, 4], [4, 1]], np.int64)
    return verts, edges


def landmark_segments(T_c_w: SE3, lm_pw, mask):
    """Camera-centre→landmark line list (rviz_frame.cpp LINE_LIST marker):
    returns (verts (1+N, 3), edges (M, 2)) for valid landmarks."""
    c = np.asarray(se3m.inverse(T_c_w).t).reshape(1, 3)
    pw = np.asarray(lm_pw).reshape(-1, 3)
    m = np.asarray(mask, bool).reshape(-1)
    verts = np.concatenate([c, pw], axis=0)
    idx = np.flatnonzero(m) + 1
    edges = np.stack([np.zeros_like(idx), idx], axis=-1)
    return verts, edges


def save_frame_marker_ply(path: str, T_c_w: SE3, lm_pw, mask) -> None:
    """One RVIZFrame-equivalent marker file: camera pyramid + landmark rays."""
    pv, pe = camera_pyramid_segments(T_c_w)
    lv, le = landmark_segments(T_c_w, lm_pw, mask)
    verts = np.concatenate([pv, lv], axis=0)
    edges = np.concatenate([pe, le + len(pv)], axis=0)
    write_ply(path, verts, edges=edges)
