#!/usr/bin/env python
"""Component split of the frontend at the BENCH operating point
(752x480, 256 slots, 3 pyramid levels, lk_iters=6).

Times each stage standalone with scan-carried state (honest per-call cost
including its own dispatch; standalone numbers double-count work XLA would
overlap inside the fused frame program, so they upper-bound the in-program
cost — use for attribution, not absolute accounting)."""

import argparse
import dataclasses
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from flvis_tpu.config import FrontendConfig
    from flvis_tpu.frontend import tracker
    from flvis_tpu.geometry import camera
    from flvis_tpu.io.synthetic import PlanarScene, SceneConfig, orbit_trajectory
    from flvis_tpu.ops import image as imops
    from flvis_tpu.ops import lk as lk_ops
    from flvis_tpu.utils.timing import sync

    dev = jax.devices()[0]
    REPS = args.reps

    cfg = FrontendConfig(width=752, height=480, num_slots=256, pyramid_levels=3,
                         per_cell=16, min_distance=15.0, margin=20,
                         lk_radius=10, lk_iters=6)
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

    state = jax.device_put(tracker.init_state(cfg), dev)
    state, _ = tracker.track_frame(cfg, cam, state, img_prev, jnp.asarray(r0))
    state, _ = tracker.track_frame(cfg, cam, state, img0, img1)
    sync(state)

    pyr_stack = imops.build_grad_pyramid(
        jnp.stack([img_prev, img0, img1]), cfg.pyramid_levels)
    pyr_prev = tuple((im[0], gx[0], gy[0]) for im, gx, gy in pyr_stack)
    pyr0 = tuple((im[1], gx[1], gy[1]) for im, gx, gy in pyr_stack)
    pyr1 = tuple((im[2], gx[2], gy[2]) for im, gx, gy in pyr_stack)
    table = state.table
    T = state.T_c_w
    lkp = tracker._lk_params(cfg)

    def timed(name, fn):
        @jax.jit
        def run():
            def step(eps, _):
                s = fn(eps)
                return s * 1e-20, s
            _, ss = jax.lax.scan(step, jnp.float32(0.0), None, length=REPS)
            return jnp.sum(ss)

        sync(run())
        n_outer = 2
        t0 = time.perf_counter()
        for _ in range(n_outer):
            sync(run())
        us = (time.perf_counter() - t0) / (n_outer * REPS) * 1e6
        print(f"{name:46s} {us:10.1f} us", flush=True)
        return us

    print(f"device={dev}  reps={REPS}  cfg=3lvl/6iter")

    def f_pyr(eps):
        stack = jnp.stack([img_prev + eps, img0 + eps, img1 + eps])
        pyrs = imops.build_grad_pyramid(stack, cfg.pyramid_levels)
        return sum(jnp.sum(a) for lv in pyrs for a in lv) * 1e-9

    def f_lk_temporal(eps):
        uv, ok, _ = lk_ops.pyramidal_lk(pyr_prev, pyr0, table.uv + eps,
                                        table.uv + eps, table.active, lkp)
        return jnp.sum(uv) * 1e-6

    def f_lk_stereo(eps):
        import flvis_tpu.ops.lk as lkm
        disp, ok = lkm.stereo_lk(pyr0, pyr1, table.uv + eps,
                                 jnp.full(table.uv.shape[0], 6.0),
                                 table.active, lkp)
        return jnp.sum(disp) * 1e-6

    def f_lk_level_fine(eps):
        img_p, gx, gy = pyr_prev[0]
        flow, ok = lk_ops._track_level(img_p, gx, gy, pyr0[0][0],
                                       table.uv + eps,
                                       jnp.zeros_like(table.uv) + eps,
                                       table.active, lkp)
        return jnp.sum(flow) * 1e-6

    def f_measure(eps):
        tb = dataclasses.replace(table, uv=table.uv + eps)
        z, ok, st = tracker._measure_depth(cfg, cam, pyr0, pyr1, None, tb, T)
        return jnp.sum(z) * 1e-9

    def f_redetect(eps):
        tb, nid = tracker._redetect(cfg, pyr0[0][0] + eps, table, T,
                                    state.next_lm_id)
        return jnp.sum(tb.uv) * 1e-9

    def f_ba(eps):
        from flvis_tpu.backend import motion_ba
        res = motion_ba.optimize_pose(
            cam, T, table.p_w + eps, table.uv, table.active & table.has_3d,
            iters1=cfg.ba_iters1, iters2=cfg.ba_iters2,
            huber_delta=cfg.huber_delta, chi2_cull=cfg.chi2_cull,
            min_points=cfg.min_inliers)
        return jnp.sum(res.T_c_w.t) * 1e-6

    def f_full(eps):
        st = dataclasses.replace(
            state,
            table=dataclasses.replace(table, uv=table.uv + eps),
            img_prev=state.img_prev + eps)
        st2, out = tracker.track_frame(cfg, cam, st, img0 + eps, img1 + eps)
        return jnp.sum(out.T_c_w.t) * 1e-6

    full = timed("FULL track_frame (carried)", f_full)
    a = timed("build_grad_pyramid (3,H,W) x3lvl", f_pyr)
    b = timed("pyramidal_lk temporal (3 lvl)", f_lk_temporal)
    c = timed("stereo_lk (3 lvl + fb)", f_lk_stereo)
    timed("  one fine LK level alone", f_lk_level_fine)
    d = timed("_measure_depth (stereo+tri)", f_measure)
    e = timed("redetect (grid features)", f_redetect)
    f = timed("motion BA (single start)", f_ba)
    print(f"{'sum of stages (pyr+lk+measure+redet+ba)':46s} "
          f"{a+b+d+e+f:10.1f} us   (full={full:.1f})")


if __name__ == "__main__":
    main()
