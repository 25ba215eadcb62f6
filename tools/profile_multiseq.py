#!/usr/bin/env python
"""Bisect the vmap×scan multiseq slowdown: per-dispatch vmap vs scan-of-vmap
with/without the (S,T)->(T,S) image transposes, different T, and a no-xs
variant (fixed images) to separate xs staging from the scan body."""

import time


def main():
    import jax
    import jax.numpy as jnp

    from flvis_tpu.config import FrontendConfig
    from flvis_tpu.frontend import tracker
    from flvis_tpu.geometry import camera
    from flvis_tpu.io.synthetic import PlanarScene, SceneConfig, orbit_trajectory
    from flvis_tpu.parallel import multiseq
    from flvis_tpu.utils.timing import sync

    dev = jax.devices()[0]
    S, Tn = 16, 8
    cfg = FrontendConfig(width=752, height=480, num_slots=256, pyramid_levels=3,
                         per_cell=16, min_distance=15.0, margin=20,
                         lk_radius=10, lk_iters=6)
    scfg = SceneConfig(width=752, height=480, fx=458.0, fy=458.0, cx=376.0,
                       cy=240.0, baseline=0.11)
    cam = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                      width=752, height=480)
    scene = PlanarScene(scfg, plane_depth=8.0, seed=0)
    poses = orbit_trajectory(Tn, step=0.03)
    frames = [scene.render(R, t) for (R, t) in poses]
    cams = jax.tree.map(
        lambda a: jnp.broadcast_to(jnp.asarray(a), (S,) + jnp.shape(jnp.asarray(a))), cam)

    i0_ts = jax.device_put(jnp.stack(
        [jnp.stack([jnp.roll(jnp.asarray(frames[t][0]), 7 * s, axis=1)
                    for s in range(S)]) for t in range(Tn)]), dev)  # (T, S, H, W)
    i1_ts = jax.device_put(jnp.stack(
        [jnp.stack([jnp.roll(jnp.asarray(frames[t][1]), 7 * s, axis=1)
                    for s in range(S)]) for t in range(Tn)]), dev)
    keys = jax.random.split(jax.random.PRNGKey(0), S)

    def timed(name, fn, per):
        sync(fn())
        n = 2
        t0 = time.perf_counter()
        for _ in range(n):
            sync(fn())
        ms = (time.perf_counter() - t0) / (n * per) * 1e3
        print(f"{name:46s} {ms:8.2f} ms/seq-frame", flush=True)

    # A: per-dispatch vmap, Tn dispatches.
    def run_a():
        sts = multiseq.init_states(cfg, S)
        for t in range(Tn):
            sts, _ = multiseq.track_frame_batch(cfg, cams, sts, i0_ts[t], i1_ts[t], keys)
        return sts
    timed("A per-dispatch vmap x8", run_a, S * Tn)

    # B: scan-of-vmap, (T,S) layout directly (no transposes).
    @jax.jit
    def run_b(a0, a1):
        def step(sts, x):
            i0, i1 = x
            vstep = jax.vmap(lambda c, st, a, b: tracker.track_frame(cfg, c, st, a, b))
            return vstep(cams, sts, i0, i1)
        sts, _ = jax.lax.scan(step, multiseq.init_states(cfg, S), (a0, a1))
        return sts
    timed("B scan-of-vmap (T,S) xs", lambda: run_b(i0_ts, i1_ts), S * Tn)

    # C: scan-of-vmap, fixed images (no xs at all).
    @jax.jit
    def run_c(a0, a1):
        def step(sts, _):
            vstep = jax.vmap(lambda c, st, a, b: tracker.track_frame(cfg, c, st, a, b))
            return vstep(cams, sts, a0, a1), None
        sts, _ = jax.lax.scan(step, multiseq.init_states(cfg, S), None, length=Tn)
        return sts
    timed("C scan-of-vmap fixed imgs", lambda: run_c(i0_ts[0], i1_ts[0]), S * Tn)

    # D: single-sequence scan for reference.
    @jax.jit
    def run_d(a0, a1):
        st = tracker.init_state(cfg)
        st, _ = tracker.track_frames_scan(cfg, cam, st, a0, a1)
        return st
    timed("D 1-seq scan8", lambda: run_d(i0_ts[:, 0], i1_ts[:, 0]), Tn)


if __name__ == "__main__":
    main()
