#!/usr/bin/env python
"""Follow-up per-stage profile: the pieces profile_stages.py doesn't cover —
triangulation eigh, depth innovation, full _measure_depth, and a full
track_frame step whose carried state cannot be hoisted out of the timing
scan (the real per-frame cost of the replay mode)."""

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=16)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax.numpy as jnp

    from flvis_tpu.config import FrontendConfig
    from flvis_tpu.frontend import tracker
    from flvis_tpu.geometry import camera, se3 as se3m, triangulation
    from flvis_tpu.geometry.se3 import SE3
    from flvis_tpu.io.synthetic import PlanarScene, SceneConfig, orbit_trajectory
    from flvis_tpu.ops import image as imops
    from flvis_tpu.utils.timing import sync

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

    state = jax.device_put(tracker.init_state(cfg), dev)
    state, _ = tracker.track_frame(cfg, cam, state, img_prev, jnp.asarray(r0))
    state, _ = tracker.track_frame(cfg, cam, state, img0, img1)
    sync(state)

    pyr0 = imops.build_grad_pyramid(img0, cfg.pyramid_levels)
    pyr1 = imops.build_grad_pyramid(img1, cfg.pyramid_levels)
    table = state.table
    T = state.T_c_w

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
        print(f"{name:44s} {us:10.1f} us", flush=True)
        return us

    print(f"device={dev}  reps={REPS}")

    def f_tri(eps):
        from flvis_tpu.geometry import camera as cam_m, so3
        T0 = table.obs0_pose()
        xn0 = cam_m.unit_ray(cam, table.obs0_uv + eps)[:, :2]
        xn1 = cam_m.unit_ray(cam, table.uv + eps)[:, :2]
        pts, ok = triangulation.triangulate_from_views(
            SE3(jnp.broadcast_to(T.q, T0.q.shape),
                jnp.broadcast_to(T.t, T0.t.shape)), T0,
            xn1[:, None, :], xn0[:, None, :],
            range_max=cfg.depth_max, range_min=cfg.depth_min)
        return jnp.sum(pts) * 1e-9

    def f_measure(eps):
        tb = dataclasses.replace(table, uv=table.uv + eps)
        z, ok, st = tracker._measure_depth(cfg, cam, pyr0, pyr1, None, tb, T)
        return jnp.sum(z) * 1e-9

    def f_innov(eps):
        tb = dataclasses.replace(table, uv=table.uv + eps)
        z = jnp.full(table.uv.shape[0], 8.0) + eps
        ok = table.active
        t2 = tracker._depth_innovation(cfg, cam, tb, T, z, ok, ok,
                                       jax.random.PRNGKey(0))
        return jnp.sum(t2.p_w) * 1e-9

    def f_full_carried(eps):
        st = dataclasses.replace(
            state,
            table=dataclasses.replace(table, uv=table.uv + eps),
            img_prev=state.img_prev + eps)
        st2, out = tracker.track_frame(cfg, cam, st, img0 + eps, img1 + eps)
        return jnp.sum(out.T_c_w.t) * 1e-6

    timed("triangulate_from_views (256)", f_tri)
    timed("_measure_depth (stereo+tri)", f_measure)
    timed("_depth_innovation", f_innov)
    timed("FULL track_frame (carried state)", f_full_carried)


if __name__ == "__main__":
    main()
