#!/usr/bin/env python
"""Ablation profile of the replay-mode frontend: re-time track_frames_scan
with individual stages weakened/removed to attribute the per-frame cost.

Each config change recompiles the whole program, so the deltas measure the
stage's TRUE marginal cost inside the fused scan (standalone stage timings
double-count work that XLA overlaps/dedups)."""

import argparse
import dataclasses
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from flvis_tpu.config import FrontendConfig
    from flvis_tpu.frontend import tracker
    from flvis_tpu.geometry import camera
    from flvis_tpu.io.synthetic import PlanarScene, SceneConfig, orbit_trajectory
    from flvis_tpu.utils.timing import sync

    dev = jax.devices()[0]
    T = 16

    base = dict(width=752, height=480, num_slots=256, pyramid_levels=3,
                per_cell=16, min_distance=15.0, margin=20,
                lk_radius=10, lk_iters=6)
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

    def timed(name, cfg):
        state = jax.device_put(tracker.init_state(cfg), dev)
        state, _ = tracker.track_frames_scan(cfg, cam, state, imgs0, imgs1)
        sync(state)  # compile + warm (state now TRACKING steady)
        n_outer = 3
        t0 = time.perf_counter()
        for _ in range(n_outer):
            state, _ = tracker.track_frames_scan(cfg, cam, state, imgs0, imgs1)
        sync(state)
        ms = (time.perf_counter() - t0) / (n_outer * T) * 1e3
        print(f"{name:46s} {ms:8.2f} ms/frame", flush=True)
        return ms

    full = timed("FULL (baseline)", FrontendConfig(**base))
    for name, delta in [
        ("lk_iters=1 (temporal+stereo GN chain)", dict(lk_iters=1)),
        ("pyramid_levels=2 (fewer LK levels)", dict(pyramid_levels=2)),
        ("num_slots=128", dict(num_slots=128)),
        ("ba_iters=1+1 (LM chain)", dict(ba_iters1=1, ba_iters2=1)),
        ("lk_radius=6 (smaller patches)", dict(lk_radius=6)),
    ]:
        cfg = FrontendConfig(**{**base, **delta})
        ms = timed(name, cfg)
        print(f"{'':46s} {full - ms:+8.2f} vs full")


if __name__ == "__main__":
    main()
