#!/usr/bin/env python
"""Run the SLAM engine over an EuRoC or KITTI sequence.

The production entry point replacing the reference's roslaunch flow
(`roslaunch flvis flvis_euroc_mav.launch` etc., /root/reference/README.md:
127-131): reads the dataset directly (no ROS), runs the frontend + sliding-
window BA (+ optional IMU fusion and loop closing), writes a TUM-format
trajectory and reports ATE RMSE against ground truth when available.

Usage:
  python examples/run_dataset.py euroc <seq_dir> [--frames N] [--imu] [--loop]
  python examples/run_dataset.py kitti <seq_dir> [--poses poses.txt] [--frames N] [--loop]
  python examples/run_dataset.py d435i <file.bag> --depth --imu \
      [--img0 /camera/infra1/image_rect_raw] [--img1 /camera/aligned_depth_to_color/image_raw]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", choices=["euroc", "kitti", "d435i"])
    ap.add_argument("path")
    ap.add_argument("--img0", default="/camera/infra1/image_rect_raw")
    ap.add_argument("--img1", default="/camera/infra2/image_rect_raw")
    ap.add_argument("--depth", action="store_true",
                    help="d435i: img1 topic is an aligned depth image")
    ap.add_argument("--fx", type=float, default=382.6)
    ap.add_argument("--fy", type=float, default=382.6)
    ap.add_argument("--cx", type=float, default=320.0)
    ap.add_argument("--cy", type=float, default=240.0)
    ap.add_argument("--baseline", type=float, default=0.05)
    ap.add_argument("--width", type=int, default=640, help="d435i frame width")
    ap.add_argument("--height", type=int, default=480, help="d435i frame height")
    ap.add_argument("--poses", default=None, help="KITTI ground-truth poses file")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--imu", action="store_true", help="enable IMU fusion (EuRoC)")
    ap.add_argument("--loop", action="store_true", help="enable loop closing + PGO")
    ap.add_argument("--pipelined", action="store_true",
                    help="double-buffered chunk replay: dispatch chunk N+1 "
                         "before resolving chunk N's fetch (results lag one "
                         "chunk; fastest single-chip mode)")
    ap.add_argument("--loop-device", type=int, default=None,
                    help="device index for the loop node (two-chip mode: "
                         "ingest/gate/verify/PGO dispatch there and overlap "
                         "the frontend chip, like the reference's loop "
                         "nodelet on spare CPU cores)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--chunk", type=int, default=0,
                    help="replay fast path: process N frames per lax.scan "
                         "device program (no per-frame dispatch; no IMU)")
    ap.add_argument("--yaml", default=None,
                    help="reference-style YAML config (the /yamlconfigfile "
                         "surface: feature_para*, vifusion_para*, dr_para*, "
                         "window_size, lc params); dataset geometry still "
                         "comes from the dataset reader")
    ap.add_argument("--out", default="est_traj.tum")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from flvis_tpu.config import BackendConfig, FrontendConfig, SystemConfig
    from flvis_tpu.io import trajectory
    from flvis_tpu.pipeline.runner import SlamSystem
    from flvis_tpu.utils import evaluation

    if args.dataset == "euroc":
        from flvis_tpu.io.euroc import EurocDataset

        ds = EurocDataset(args.path)
        T_i_c = ds.T_i_c
        cam = ds.camera
    elif args.dataset == "kitti":
        from flvis_tpu.io.kitti import KittiDataset

        ds = KittiDataset(args.path, poses_file=args.poses)
        T_i_c = None
        cam = ds.camera
    else:  # d435i rosbag
        from flvis_tpu.geometry import camera as cam_m
        from flvis_tpu.io import rosbag as bag

        class _BagDS:
            def __init__(self):
                self.gt_pos = None
                self._frames = bag.d435i_frames(args.path, args.img0, args.img1)

            def __len__(self):
                return args.frames or 10 ** 9

            def frames(self, stop=None):
                import itertools
                return itertools.islice(self._frames, stop)

        ds = _BagDS()
        T_i_c = None
        cam = cam_m.make(args.fx, args.fy, args.cx, args.cy,
                         baseline=0.0 if args.depth else args.baseline,
                         depth_factor=1000.0,
                         width=args.width, height=args.height)
    depth_mode = args.dataset == "d435i" and args.depth
    if args.yaml:
        import dataclasses

        from flvis_tpu.config import load_yaml

        cfg = load_yaml(args.yaml)
        # The dataset reader owns the image geometry (it rectifies); the
        # YAML keeps the algorithm parameter surface.
        fe = dataclasses.replace(cfg.frontend, width=cam.width,
                                 height=cam.height, num_slots=256,
                                 depth_mode=depth_mode)
        cfg = dataclasses.replace(cfg, frontend=fe)
    else:
        fe = FrontendConfig(width=cam.width, height=cam.height, num_slots=256,
                            pyramid_levels=4, per_cell=16,
                            depth_mode=depth_mode)
        cfg = SystemConfig(frontend=fe, backend=BackendConfig())
    if args.imu and args.dataset == "kitti":
        raise SystemExit("--imu: KITTI odometry sequences carry no IMU data")
    loop_dev = (jax.devices()[args.loop_device]
                if args.loop_device is not None else None)
    slam = SlamSystem(cfg, cam, T_i_c=T_i_c, use_imu=args.imu,
                      use_loop=args.loop, loop_device=loop_dev,
                      pipelined=args.pipelined and args.chunk > 1)

    n = min(args.frames or len(ds), len(ds))
    t0 = time.perf_counter()
    if args.chunk > 1:
        buf = []
        done = 0
        for fr in ds.frames(stop=n):
            buf.append(fr)
            if len(buf) == args.chunk:
                if args.imu:
                    # Fused VIO chunk: IMU propagation + feedforward +
                    # tracking + BA + feedback in one device program.
                    outs = slam.process_frames_vio(
                        np.stack([f.img0 for f in buf]),
                        np.stack([f.img1 for f in buf]),
                        ts=np.asarray([f.t for f in buf]),
                        imu_acc=[f.imu_acc for f in buf],
                        imu_gyro=[f.imu_gyro for f in buf],
                        imu_t=[f.imu_t for f in buf])
                else:
                    outs = slam.process_frames(
                        np.stack([f.img0 for f in buf]),
                        np.stack([f.img1 for f in buf]),
                        ts=np.asarray([f.t for f in buf]))
                done += len(buf)
                if outs is not None:       # pipelined: lags one chunk
                    status = ["UNINIT", "TRACK", "FAIL"][int(outs.status[-1])]
                    print(f"frame {done:5d}/{n}  {status}  "
                          f"inliers={int(outs.num_inliers[-1]):3d} "
                          f"kfs={len(slam.keyframes)}", flush=True)
                buf = []
        slam.flush()   # drain the in-flight chunk (pipelined mode)
        for f in buf:  # tail shorter than a chunk: stepwise
            if args.imu and getattr(f, "imu_t", None) is not None and len(f.imu_t):
                slam.feed_imu(f.imu_acc, f.imu_gyro, f.imu_t)
            slam.process_frame(f.img0, f.img1, t_img=f.t)
    else:
        for i, fr in enumerate(ds.frames(stop=n)):
            if args.imu and getattr(fr, "imu_t", None) is not None and len(fr.imu_t):
                slam.feed_imu(fr.imu_acc, fr.imu_gyro, fr.imu_t)
            out = slam.process_frame(fr.img0, fr.img1, t_img=fr.t)
            if i % 20 == 0:
                status = ["UNINIT", "TRACK", "FAIL"][int(out.status)]
                print(f"frame {i:5d}/{n}  {status}  inliers={int(out.num_inliers):3d} "
                      f"kfs={len(slam.keyframes)}", flush=True)
    elapsed = time.perf_counter() - t0
    print(f"\nprocessed {n} frames in {elapsed:.1f} s ({n / elapsed:.1f} fps)")

    ts = np.asarray([t for (_, t, _, _) in slam.trajectory])
    slam.flush_loop()     # resolve the last chunk's deferred loop gate
    C = slam.trajectory_cam_centers(loop_corrected=args.loop)
    qs = np.asarray([q for (_, _, q, _) in slam.trajectory])
    trajectory.write_tum(args.out, ts, C, qs)
    print(f"wrote {args.out}")

    # Evaluation against ground truth.
    if args.dataset == "euroc" and ds.gt_pos is not None:
        ia, ib = evaluation.associate(ts, ds.gt_t)
        if len(ia) > 10:
            rmse, _ = evaluation.ate_rmse(C[ia], ds.gt_pos[ib])
            print(f"ATE RMSE vs ground truth: {rmse * 100:.2f} cm over {len(ia)} poses")
    elif args.dataset == "kitti" and ds.gt_poses is not None:
        m = min(len(C), len(ds.gt_poses))
        rmse, _ = evaluation.ate_rmse(C[:m], ds.gt_poses[:m, :3, 3])
        print(f"ATE RMSE vs ground truth: {rmse:.3f} m over {m} poses")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
