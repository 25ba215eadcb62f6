#!/usr/bin/env python
"""Per-stage device-time profile of the frontend program on the real TPU.

Times each frontend component inside a lax.scan with a data dependence
(the scalar sum of each iteration's output perturbs the next iteration's
input) so XLA cannot CSE the repeats and per-dispatch tunnel latency is
amortized across REPS device-side iterations.  This is the observability
counterpart of the reference's tic_toc_ros per-stage printfs
(/root/reference/src/utils/include/tic_toc_ros.h:13-36) at device-program
granularity.

Usage:  python tools/profile_stages.py [--cpu] [--reps 32]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=32)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses
    import functools

    import jax.numpy as jnp

    from flvis_tpu.config import FrontendConfig
    from flvis_tpu.frontend import tracker
    from flvis_tpu.geometry import camera, se3 as se3m
    from flvis_tpu.io.synthetic import PlanarScene, SceneConfig, orbit_trajectory
    from flvis_tpu.ops import features as feat_ops
    from flvis_tpu.ops import image as imops
    from flvis_tpu.ops import lk as lk_ops
    from flvis_tpu.ops import ransac as ransac_ops
    from flvis_tpu.backend import motion_ba

    dev = jax.devices()[0]
    REPS = args.reps

    cfg = FrontendConfig(width=752, height=480, num_slots=256, pyramid_levels=4,
                         per_cell=16, min_distance=15.0, margin=20,
                         lk_radius=10, lk_iters=10)
    scfg = SceneConfig(width=752, height=480, fx=458.0, fy=458.0, cx=376.0,
                       cy=240.0, baseline=0.11)
    cam = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                      width=752, height=480)
    scene = PlanarScene(scfg, plane_depth=8.0, seed=0)
    (R0, t0), (R1, t1) = orbit_trajectory(2, step=0.03)
    l0, r0, _ = scene.render(R0, t0)
    l1, r1, _ = scene.render(R1, t1)
    img_prev = jax.device_put(jnp.asarray(l0), dev)
    img0 = jax.device_put(jnp.asarray(l1), dev)
    img1 = jax.device_put(jnp.asarray(r1), dev)

    # Build a realistic mid-track state by running two real frames.
    state = jax.device_put(tracker.init_state(cfg), dev)
    state, _ = tracker.track_frame(cfg, cam, state, img_prev, jnp.asarray(r0))
    state, _ = tracker.track_frame(cfg, cam, state, img0, img1)
    from flvis_tpu.utils.timing import sync as _s
    _s(state)

    pyr_prev = imops.build_grad_pyramid(img_prev, cfg.pyramid_levels)
    pyr0 = imops.build_grad_pyramid(img0, cfg.pyramid_levels)
    pyr1 = imops.build_grad_pyramid(img1, cfg.pyramid_levels)
    table = state.table
    T = state.T_c_w
    lk_params = lk_ops.LKParams(radius=cfg.lk_radius,
                                num_levels=cfg.pyramid_levels,
                                iters=cfg.lk_iters, min_eig=cfg.lk_min_eig)

    from flvis_tpu.utils.timing import sync

    def timed(name, fn, *xs):
        """fn(*xs, eps) -> scalar; scanned REPS times with eps feedback.

        Sync is a host FETCH of the result (axon's block_until_ready does
        not actually wait — see utils/timing.py)."""

        @jax.jit
        def run():
            def step(eps, _):
                s = fn(*xs, eps)
                return s * 1e-20, s

            _, ss = jax.lax.scan(step, jnp.float32(0.0), None, length=REPS)
            return jnp.sum(ss)

        sync(run())  # compile + warm
        n_outer = 2
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(n_outer):
            acc += sync(run())
        us = (time.perf_counter() - t0) / (n_outer * REPS) * 1e6
        print(f"{name:44s} {us:10.1f} us", flush=True)
        return us

    print(f"device={dev}  reps={REPS}  (us per invocation, dispatch amortized)")

    def f_eq(img, eps):
        return jnp.sum(imops.equalize_hist(img + eps)) * 1e-12

    def f_pyr(img, eps):
        p = imops.build_grad_pyramid(img + eps, cfg.pyramid_levels)
        return sum(jnp.sum(x) for lev in p for x in lev) * 1e-12

    def f_lk(eps):
        uv, ok, _ = lk_ops.pyramidal_lk(pyr_prev, pyr0, table.uv + eps,
                                        table.uv + eps, table.active, lk_params)
        return jnp.sum(uv) * 1e-9

    def f_stereo(eps):
        nlv = min(3, cfg.pyramid_levels)
        sp = dataclasses.replace(lk_params, num_levels=nlv)
        z3d = jnp.full(table.uv.shape[0], 8.0)
        disp, ok = lk_ops.stereo_lk(pyr0[:nlv], pyr1[:nlv], table.uv + eps,
                                    cam.fx * cam.baseline / z3d,
                                    table.active, sp)
        return jnp.sum(disp) * 1e-9

    def f_ransac(eps):
        inl, _, _ = ransac_ops.fundamental_ransac(
            jax.random.PRNGKey(0), table.uv + eps, table.uv + 1.0 + eps,
            table.active, threshold=cfg.ransac_threshold,
            num_hypotheses=cfg.ransac_hypotheses)
        return jnp.sum(inl) * 1e-6

    def f_ba(eps):
        r = motion_ba.optimize_pose(cam, se3m.SE3(T.q, T.t + eps), table.p_w,
                                    table.uv, table.active & table.has_3d,
                                    iters1=cfg.ba_iters1, iters2=cfg.ba_iters2,
                                    huber_delta=cfg.huber_delta,
                                    chi2_cull=cfg.chi2_cull,
                                    min_points=cfg.min_inliers)
        return jnp.sum(r.T_c_w.t) * 1e-6

    def f_detect(img, eps):
        dp = feat_ops.DetectParams(grid_rows=cfg.grid_rows,
                                   grid_cols=cfg.grid_cols,
                                   per_cell=cfg.per_cell,
                                   min_distance=cfg.min_distance,
                                   quality_level=cfg.quality_level,
                                   margin=cfg.margin)
        uv, _, v = feat_ops.detect_grid_features(img + eps, table.uv,
                                                 table.active, dp)
        return jnp.sum(uv) * 1e-9

    def f_full(eps):
        st2, out = tracker.track_frame(cfg, cam, state,
                                       img0 + eps, img1 + eps)
        return jnp.sum(out.T_c_w.t) * 1e-6

    t_eq = timed("equalize_hist (x1)", f_eq, img0)
    t_pyr = timed("build_grad_pyramid (x1)", f_pyr, img0)
    t_lk = timed("pyramidal_lk temporal", f_lk)
    t_st = timed("stereo_lk (fwd+bwd)", f_stereo)
    t_ra = timed("fundamental_ransac", f_ransac)
    t_ba = timed("motion_ba (x1)", f_ba)
    t_de = timed("detect_grid_features", f_detect, img0)
    t_full = timed("FULL track_frame", f_full)
    acct = 2 * t_eq + 2 * t_pyr + t_lk + t_st + t_ra + 2 * t_ba + t_de
    print(f"{'sum of parts (2eq+2pyr+lk+st+ra+2ba+det)':44s} {acct:10.1f} us")
    print(f"{'unaccounted (triangulation/innovation/misc)':44s} "
          f"{t_full - acct:10.1f} us")


if __name__ == "__main__":
    main()
