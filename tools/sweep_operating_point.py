#!/usr/bin/env python
"""Sweep LK iteration/level/radius operating points at EuRoC scale: replay
throughput (fetch-synced) AND trajectory accuracy vs ground truth for each,
so speed is never bought with silent accuracy loss."""

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from flvis_tpu.config import FrontendConfig
    from flvis_tpu.frontend import tracker
    from flvis_tpu.geometry import camera, se3 as se3m, so3
    from flvis_tpu.io.synthetic import PlanarScene, SceneConfig, orbit_trajectory
    from flvis_tpu.utils.timing import sync

    dev = jax.devices()[0]
    T = args.frames

    scfg = SceneConfig(width=752, height=480, fx=458.0, fy=458.0, cx=376.0,
                       cy=240.0, baseline=0.11)
    cam = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                      width=752, height=480)
    scene = PlanarScene(scfg, plane_depth=8.0, seed=0)
    poses = orbit_trajectory(T, step=0.03)
    frames = [scene.render(R, t) for (R, t) in poses]
    imgs0 = jax.device_put(jnp.stack([jnp.asarray(f[0]) for f in frames]), dev)
    imgs1 = jax.device_put(jnp.stack([jnp.asarray(f[1]) for f in frames]), dev)
    gt_C = np.stack([-(R.T @ t) for (R, t) in poses])

    def run(tag, **over):
        base = dict(width=752, height=480, num_slots=256, pyramid_levels=4,
                    per_cell=16, min_distance=15.0, margin=20,
                    lk_radius=10, lk_iters=10)
        cfg = FrontendConfig(**{**base, **over})
        st = jax.device_put(tracker.init_state(cfg), dev)
        st, outs = tracker.track_frames_scan(cfg, cam, st, imgs0, imgs1)
        sync(st)
        # ATE on camera centres.
        q = np.asarray(outs.T_c_w.q)
        t = np.asarray(outs.T_c_w.t)
        C = np.stack([
            -(np.asarray(so3.to_matrix(jnp.asarray(qq))).T @ tt)
            for qq, tt in zip(q, t)])
        ate = float(np.sqrt(np.mean(np.sum((C - gt_C) ** 2, -1)))) * 100
        ok = int(np.asarray(outs.status).sum())
        # Throughput (state already warm/tracking).
        n_outer = 3
        t0 = time.perf_counter()
        for _ in range(n_outer):
            st, _ = tracker.track_frames_scan(cfg, cam, st, imgs0, imgs1)
        sync(st)
        ms = (time.perf_counter() - t0) / (n_outer * T) * 1e3
        print(f"{tag:36s} ate={ate:6.2f}cm  track={ok}/{T}  {ms:6.2f} ms/frame",
              flush=True)

    run("baseline i10 L4 r10")
    run("i6 L4 r10", lk_iters=6)
    run("i6 L3 r10", lk_iters=6, pyramid_levels=3)
    run("i5 L3 r10", lk_iters=5, pyramid_levels=3)
    run("i6 L3 r8", lk_iters=6, pyramid_levels=3, lk_radius=8)
    run("i8 L3 r10", lk_iters=8, pyramid_levels=3)
    run("i6 L4 r8", lk_iters=6, lk_radius=8)


if __name__ == "__main__":
    main()
