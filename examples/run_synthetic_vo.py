#!/usr/bin/env python
"""Run the stereo visual-odometry frontend on a synthetic scene.

The no-dataset-needed end-to-end demo: renders a textured-plane stereo
sequence with exact ground truth, runs the jitted tracker over it, and
reports per-frame tracking stats plus the final ATE RMSE.

Usage:
  python examples/run_synthetic_vo.py [--frames 40] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--cpu", action="store_true", help="force the local CPU backend")
    ap.add_argument("--backend", action="store_true",
                    help="run the full pipeline with sliding-window BA feedback")
    ap.add_argument("--loop", action="store_true",
                    help="out-and-back trajectory with loop closing + PGO")
    ap.add_argument("--viz-dir", default=None,
                    help="write per-frame debug overlay PNGs, frame-marker "
                         "PLYs and (with --backend) a sparse-map PLY here")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from flvis_tpu.config import FrontendConfig
    from flvis_tpu.frontend import tracker
    from flvis_tpu.geometry import camera, so3
    from flvis_tpu.io.synthetic import PlanarScene, SceneConfig, orbit_trajectory

    print(f"devices: {jax.devices()}")
    scfg = SceneConfig()
    scene = PlanarScene(scfg, plane_depth=8.0, seed=1)
    if args.loop:
        half = args.frames // 2
        xs = list(np.linspace(0, 0.03 * half, half))
        xs += list(np.linspace(0.03 * half, 0.01, args.frames - half))
        poses = []
        for x in xs:
            R = np.eye(3)
            poses.append((R, -R @ np.array([x, 0.0, 0.0])))
    else:
        poses = orbit_trajectory(args.frames, step=0.03)
    cfg = FrontendConfig(width=scfg.width, height=scfg.height, num_slots=128,
                         pyramid_levels=3, per_cell=8, min_distance=12.0, margin=22)
    cam = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                      width=scfg.width, height=scfg.height)

    print("rendering frames on host...")
    frames = [scene.render(R, t) for (R, t) in poses]

    slam = None
    if args.backend or args.loop:
        from flvis_tpu.config import BackendConfig, LoopConfig, SystemConfig
        from flvis_tpu.pipeline.runner import SlamSystem

        syscfg = SystemConfig(
            frontend=cfg,
            backend=BackendConfig(window_size=5, max_landmarks=256),
            loop=LoopConfig(max_keyframes=128, num_orb_features=200,
                            vocab_words=128, kf_start=8, kf_dist=6,
                            nkf_closest=2, min_pts=12, min_score=0.03,
                            ratio_ransac=0.3, seq_edge_successors=3),
        )
        slam = SlamSystem(syscfg, cam, use_loop=args.loop,
                          output_sparse_map=args.viz_dir is not None)

    state = tracker.init_state(cfg)
    errs = []
    t_start = None
    for i, ((R, t), (img_l, img_r, _)) in enumerate(zip(poses, frames)):
        if slam is not None:
            out = slam.process_frame(img_l, img_r)
        else:
            state, out = tracker.track_frame(cfg, cam, state, jnp.asarray(img_l), jnp.asarray(img_r))
        out_np = jax.tree.map(np.asarray, out)
        if i == 0:
            t_start = time.perf_counter()  # skip compile time
        C_gt = -R.T @ t
        R_e = np.asarray(so3.to_matrix(jnp.asarray(out_np.T_c_w.q)))
        C_e = -R_e.T @ out_np.T_c_w.t
        err = np.linalg.norm(C_gt - C_e)
        errs.append(err)
        status = ["UNINIT", "TRACKING", "FAIL"][int(out_np.status)]
        kf = " KF" if out_np.is_keyframe else ""
        print(f"frame {i:3d}  {status:9s} inliers={int(out_np.num_inliers):3d} "
              f"reproj={float(out_np.mean_reproj_err):5.2f}px  pos_err={err * 100:6.2f}cm{kf}")
        if args.viz_dir:
            from flvis_tpu.geometry import se3
            from flvis_tpu.viz import cloud as vcloud, overlay

            os.makedirs(args.viz_dir, exist_ok=True)
            st = slam.fe_state if slam is not None else state
            tbl = jax.tree.map(np.asarray, st.table)
            T = se3.SE3(jnp.asarray(out_np.T_c_w.q), jnp.asarray(out_np.T_c_w.t))
            z = np.asarray(se3.transform_points(T, jnp.asarray(tbl.p_w)))[:, 2]
            vis = overlay.to_rgb(img_l)
            fps = i / max(time.perf_counter() - t_start, 1e-6) if i > 0 else 0.0
            overlay.draw_frame(vis, tbl.uv, z, tbl.active & tbl.has_3d,
                               fps=fps, reproj_err=float(out_np.mean_reproj_err),
                               zmin=1.0, zmax=12.0)
            overlay.save_png(os.path.join(args.viz_dir, f"frame_{i:04d}.png"), vis)
            if out_np.is_keyframe:
                vcloud.save_frame_marker_ply(
                    os.path.join(args.viz_dir, f"marker_{i:04d}.ply"),
                    T, tbl.p_w, tbl.active & tbl.has_3d)
    elapsed = time.perf_counter() - t_start
    n_timed = len(frames) - 1
    if slam is not None and slam.loop_closer is not None:
        ncl = len(slam.loop_closer.closures)
        print(f"\nloop closures accepted: {ncl}")
    if args.viz_dir and slam is not None and slam.sparse_map is not None:
        n_map = slam.sparse_map.save_ply(os.path.join(args.viz_dir, "sparse_map.ply"))
        print(f"sparse map: {n_map} voxel points -> {args.viz_dir}/sparse_map.ply")
    ate = float(np.sqrt(np.mean(np.square(errs))))
    path_len = 0.03 * len(poses)
    print(f"\nATE RMSE: {ate * 100:.2f} cm over a {path_len:.2f} m path "
          f"({100 * ate / path_len:.2f} %)")
    print(f"throughput: {n_timed / elapsed:.1f} frames/s (after compile)")
    ok = ate < 0.02 * path_len + 0.01
    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
