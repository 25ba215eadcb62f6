"""Single-controller SLAM pipeline: frontend + sliding-window BA (+ VIO).

Replaces the reference's three-ROS-nodelet architecture
(/root/reference/src/frontend/vo_tracking.cpp, src/backend/vo_localmap.cpp,
src/backend/vo_loopclosing.cpp with /vo_kf and /vo_localmap_feedback topics)
by a host-side orchestrator over jitted device programs:

  - tracker.track_frame          — per-frame frontend (one XLA program)
  - window_ba.add_keyframe/optimize — per-keyframe backend BA
  - vimotion.imu_feed_batch      — inter-frame IMU packets

Pipelining comes from JAX's async dispatch: the BA program launched at a
keyframe overlaps the next frontend frames; its Correction is applied one
frame later — the same "corrections arrive K frames late and are rebased"
semantics as the reference's feedback topic (f2f_tracking.cpp:189-219).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

import functools

from ..backend import window_ba
from ..config import SystemConfig
from ..frontend import tracker
from ..geometry import se3 as se3m
from ..geometry.camera import StereoCamera
from ..geometry.se3 import SE3
from ..vio import vimotion


@jax.jit
def _pack_outputs(outs):
    """Pack the per-frame FrameOutput fields into ONE (T, 12) array so the
    host needs a single device fetch per chunk — under a remote-TPU tunnel
    each fetch is a network round trip, and fetching the 6 fields separately
    cost ~6 RTTs (~10 ms/frame at chunk 16)."""
    return jnp.concatenate([
        outs.is_keyframe[:, None].astype(jnp.float32),
        outs.reset_backend[:, None].astype(jnp.float32),
        outs.status[:, None].astype(jnp.float32),
        outs.num_inliers[:, None].astype(jnp.float32),
        outs.mean_reproj_err[:, None],
        outs.T_c_w.q, outs.T_c_w.t,
    ], axis=1)


def _unpack_outputs(packed: np.ndarray):
    from ..frontend.tracker import FrameOutput

    return FrameOutput(
        T_c_w=SE3(packed[:, 5:9], packed[:, 9:12]),
        is_keyframe=packed[:, 0] > 0.5,
        reset_backend=packed[:, 1] > 0.5,
        num_inliers=packed[:, 3].astype(np.int32),
        mean_reproj_err=packed[:, 4],
        status=packed[:, 2].astype(np.int32),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _kf_step(cfg, cam, ba_state, pkts, i):
    """Slice keyframe i out of a chunk's stacked packets, insert it into the
    window, and optimize — ONE device program instead of ~15 separate
    dispatches (13 packet-field slices + add_keyframe + optimize), which
    dominate the per-keyframe cost under a remote-TPU tunnel."""
    pkt = jax.tree.map(lambda a: a[i], pkts)
    st = window_ba.add_keyframe(cfg, ba_state, pkt)
    res = window_ba.optimize(cfg, cam, st)
    return res, pkt


class SlamSystem:
    """Stereo(+IMU) SLAM engine instance for one sequence."""

    def __init__(self, cfg: SystemConfig, cam: StereoCamera,
                 T_i_c: Optional[SE3] = None, use_imu: bool = False,
                 use_loop: bool = False, output_sparse_map: bool = False):
        self.cfg = cfg
        self.cam = cam
        self.use_imu = use_imu
        self.T_i_c = T_i_c if T_i_c is not None else se3m.identity()
        self.fe_state = tracker.init_state(cfg.frontend)
        self.ba_state = window_ba.empty(cfg.backend)
        self.vio_state = vimotion.init_state(cfg.vio)
        self.pending_corr: Optional[window_ba.Correction] = None
        self.keyframes: list = []       # host log of keyframe packets (for loop closing)
        self.trajectory: list = []      # (frame_id, t_img, q, t)
        self.ba_costs: list = []
        self.loop_closer = None
        if use_loop:
            from ..loop.loop_closing import LoopCloser

            self.loop_closer = LoopCloser(cfg.loop, cam,
                                          depth_mode=cfg.frontend.depth_mode)
        # The reference's `output_sparse_map` YAML flag: accumulate BA-
        # corrected landmarks into a voxel-downsampled map cloud
        # (vo_localmap.cpp:367-377).
        self.sparse_map = None
        if output_sparse_map:
            from ..viz.cloud import SparseMapRecorder

            self.sparse_map = SparseMapRecorder()

    # ------------------------------------------------------------------ IMU
    def feed_imu(self, acc, gyro, t):
        """Feed a batch of IMU samples (arrays (B,3), (B,3), (B,)).

        Batches are padded to the next multiple of 16 with a validity mask so
        jitter in per-frame IMU counts doesn't trigger recompiles."""
        b = len(t)
        if b == 0:
            return
        pad = (-b) % 16
        acc = np.concatenate([np.asarray(acc, np.float32), np.zeros((pad, 3), np.float32)])
        gyro = np.concatenate([np.asarray(gyro, np.float32), np.zeros((pad, 3), np.float32)])
        tt = np.concatenate([np.asarray(t, np.float32), np.zeros(pad, np.float32)])
        valid = np.arange(b + pad) < b
        self.vio_state = vimotion.imu_feed_batch(
            self.cfg.vio, self.vio_state,
            jnp.asarray(acc), jnp.asarray(gyro), jnp.asarray(tt),
            jnp.asarray(valid),
        )

    # ---------------------------------------------------------------- frame
    def process_frame(self, img0, img1, t_img: float = 0.0):
        cfg = self.cfg

        # Apply the previous keyframe's BA correction (feedback loop).
        if self.pending_corr is not None:
            self.fe_state = tracker.apply_correction(self.fe_state, self.pending_corr)
            self.pending_corr = None

        prior = None
        use_prior = False
        if self.use_imu:
            ff = vimotion.get_frame_state(self.vio_state, jnp.asarray(t_img), self.T_i_c)
            if bool(ff.ok):
                prior = ff.T_c_w
                use_prior = True

        self.fe_state, out = tracker.track_frame(
            cfg.frontend, self.cam, self.fe_state,
            jnp.asarray(img0), jnp.asarray(img1),
            prior_T=prior, use_prior=use_prior,
        )

        if bool(out.reset_backend):
            # KFMSG_CMD_RESET_LM: wipe the window (vo_localmap.cpp:89-98).
            self.ba_state = window_ba.reset(cfg.backend, self.ba_state)

        if bool(out.is_keyframe):
            pkt = tracker.make_keyframe_packet(self.fe_state, out)
            self.ba_state = window_ba.add_keyframe(cfg.backend, self.ba_state, pkt)
            res = window_ba.optimize(cfg.backend, self.cam, self.ba_state)
            self.ba_state = res.state
            self.pending_corr = res.correction   # applied next frame (async)
            if self.sparse_map is not None and bool(res.correction.valid):
                self.sparse_map.add_correction(
                    res.correction.lm_id, res.correction.lm_pw,
                    res.correction.lm_mask)
            self.keyframes.append(pkt)
            self.ba_costs.append(res.cost)
            if self.loop_closer is not None:
                # Loop node ingests the same keyframe stream (/vo_kf).
                k = self.loop_closer.add_keyframe(img0, img1, out.T_c_w,
                                                  int(pkt.frame_id))
                if self.loop_closer.detect_loop(k) is not None:
                    self.loop_closer.optimize_graph()

        if self.use_imu and bool(out.status == tracker.STATUS_TRACKING):
            # Vision → IMU feedback (bias estimation + state rebase).
            self.vio_state = vimotion.correction_from_vision(
                cfg.vio, self.vio_state, jnp.asarray(t_img), out.T_c_w, self.T_i_c
            )

        self.trajectory.append(
            (int(self.fe_state.frame_id) - 1, t_img,
             np.asarray(out.T_c_w.q), np.asarray(out.T_c_w.t))
        )
        return out

    # ---------------------------------------------------------- chunk replay
    def process_frames(self, imgs0, imgs1, ts=None):
        """Dataset-replay fast path: run a CHUNK of frames as one lax.scan
        device program, then handle keyframes/corrections on the host.

        ~8x the stepwise throughput (no per-frame dispatch).  BA feedback
        lands at chunk boundaries — the reference's corrections already
        arrive K frames late (f2f_tracking.cpp:189-219), here K = chunk.
        IMU feedforward is not available inside a chunk, so this path suits
        the no-IMU configs (e.g. KITTI) or post-processing runs.

        Args:
          imgs0/imgs1: (T, H, W) stacked frames; ts optional (T,) times.
        Returns the stacked FrameOutput (host numpy pytree).
        """
        cfg = self.cfg
        if self.pending_corr is not None:
            self.fe_state = tracker.apply_correction(self.fe_state, self.pending_corr)
            self.pending_corr = None
        imgs0 = jnp.asarray(imgs0)
        imgs1 = jnp.asarray(imgs1)
        T = imgs0.shape[0]
        self.fe_state, (outs, pkts) = tracker.track_frames_scan(
            cfg.frontend, self.cam, self.fe_state, imgs0, imgs1,
            with_packets=True)
        outs_np = _unpack_outputs(np.asarray(_pack_outputs(outs)))
        first_fid = int(self.fe_state.frame_id) - T
        for i in range(T):
            t_img = float(ts[i]) if ts is not None else 0.0
            if bool(outs_np.reset_backend[i]):
                self.ba_state = window_ba.reset(cfg.backend, self.ba_state)
            if bool(outs_np.is_keyframe[i]):
                res, pkt = _kf_step(cfg.backend, self.cam, self.ba_state,
                                    pkts, jnp.asarray(i, jnp.int32))
                self.ba_state = res.state
                self.pending_corr = res.correction
                if self.sparse_map is not None and bool(res.correction.valid):
                    self.sparse_map.add_correction(
                        res.correction.lm_id, res.correction.lm_pw,
                        res.correction.lm_mask)
                self.keyframes.append(pkt)
                self.ba_costs.append(res.cost)
                if self.loop_closer is not None:
                    T_c_w = SE3(jnp.asarray(outs_np.T_c_w.q[i]),
                                jnp.asarray(outs_np.T_c_w.t[i]))
                    k = self.loop_closer.add_keyframe(
                        imgs0[i], imgs1[i], T_c_w, int(pkt.frame_id))
                    if self.loop_closer.detect_loop(k) is not None:
                        self.loop_closer.optimize_graph()
            self.trajectory.append(
                (first_fid + i, float(ts[i]) if ts is not None else 0.0,
                 outs_np.T_c_w.q[i], outs_np.T_c_w.t[i]))
        return outs_np

    # ------------------------------------------------------------- exports
    def trajectory_cam_centers(self, loop_corrected: bool = False):
        """(N, 3) camera centres C = -Rᵀ t in world frame.

        With loop_corrected=True the loop-closer's map→odom drift transform
        is applied (the reference's drift-corrected republished path)."""
        from ..geometry import so3
        out = []
        for (_, _, q, t) in self.trajectory:
            T = SE3(jnp.asarray(q), jnp.asarray(t))
            if loop_corrected and self.loop_closer is not None:
                T = self.loop_closer.corrected_pose(T)
            R = np.asarray(so3.to_matrix(T.q))
            out.append(-R.T @ np.asarray(T.t))
        return np.asarray(out)
