#!/usr/bin/env python
"""Bisect why track_frames_scan is ~24x slower per frame than an
eps-perturbed scan over the same track_frame body.

Variants (all ONE jitted dispatch, fetch-synced, per-frame time printed):
  A  real track_frames_scan over a 16-frame stacked chunk (state carry + xs)
  B  lax.scan, state carry, images from xs (hand-rolled = A)
  C  lax.scan, state carry, FIXED captured image pair (no xs)
  D  lax.scan, scalar carry, state captured, eps-perturbed images (fast ref)
"""

import time


def main():
    import jax
    import jax.numpy as jnp

    from flvis_tpu.config import FrontendConfig
    from flvis_tpu.frontend import tracker
    from flvis_tpu.geometry import camera
    from flvis_tpu.io.synthetic import PlanarScene, SceneConfig, orbit_trajectory
    from flvis_tpu.utils.timing import sync

    dev = jax.devices()[0]
    T = 16

    cfg = FrontendConfig(width=752, height=480, num_slots=256, pyramid_levels=4,
                         per_cell=16, min_distance=15.0, margin=20,
                         lk_radius=10, lk_iters=10)
    scfg = SceneConfig(width=752, height=480, fx=458.0, fy=458.0, cx=376.0,
                       cy=240.0, baseline=0.11)
    cam = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                      width=752, height=480)
    scene = PlanarScene(scfg, plane_depth=8.0, seed=0)
    poses = orbit_trajectory(8, step=0.03)
    frames = [scene.render(R, t) for (R, t) in poses]
    imgs0 = jax.device_put(
        jnp.stack([jnp.asarray(frames[i % 8][0]) for i in range(T)]), dev)
    imgs1 = jax.device_put(
        jnp.stack([jnp.asarray(frames[i % 8][1]) for i in range(T)]), dev)

    state = jax.device_put(tracker.init_state(cfg), dev)
    state, _ = tracker.track_frame(cfg, cam, state, imgs0[0], imgs1[0])
    state, _ = tracker.track_frame(cfg, cam, state, imgs0[1], imgs1[1])
    sync(state)

    def timed(name, fn, n_outer=2):
        sync(fn())  # compile + warm
        t0 = time.perf_counter()
        for _ in range(n_outer):
            sync(fn())
        ms = (time.perf_counter() - t0) / (n_outer * T) * 1e3
        print(f"{name:52s} {ms:9.2f} ms/frame", flush=True)

    # A: the real replay program.
    def run_a():
        st, outs = tracker.track_frames_scan(cfg, cam, state, imgs0, imgs1)
        return st.T_c_w.t

    # B: hand-rolled equivalent.
    @jax.jit
    def run_b():
        def step(st, xs):
            i0, i1 = xs
            st2, out = tracker.track_frame(cfg, cam, st, i0, i1)
            return st2, out.T_c_w.t

        st, ts = jax.lax.scan(step, state, (imgs0, imgs1))
        return st.T_c_w.t

    # C: state carry, fixed image pair.
    @jax.jit
    def run_c():
        def step(st, _):
            st2, out = tracker.track_frame(cfg, cam, st, imgs0[0], imgs1[0])
            return st2, out.T_c_w.t

        st, ts = jax.lax.scan(step, state, None, length=T)
        return st.T_c_w.t

    # D: scalar carry, eps-perturbed images, state const (fast reference).
    @jax.jit
    def run_d():
        def step(eps, _):
            st2, out = tracker.track_frame(cfg, cam, state,
                                           imgs0[0] + eps, imgs1[0] + eps)
            s = jnp.sum(out.T_c_w.t) * 1e-6
            return s * 1e-20, s

        e, ss = jax.lax.scan(step, jnp.float32(0.0), None, length=T)
        return jnp.sum(ss)

    print(f"device={dev}  chunk={T}")
    timed("D scalar-carry eps scan (fast ref)", run_d)
    timed("C state-carry, fixed images", run_c)
    timed("B state-carry + xs images (hand-rolled)", run_b)
    timed("A track_frames_scan (real)", run_a)


if __name__ == "__main__":
    main()
