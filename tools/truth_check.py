#!/usr/bin/env python
"""Sanity-check timing methodology on the axon remote TPU.

Compares block_until_ready-based timing against actually fetching the result
to host (np.asarray), for the scan replay mode — if the two differ wildly,
block_until_ready is returning before the computation finishes and every
number measured with it is inflated.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from flvis_tpu.config import FrontendConfig
    from flvis_tpu.frontend import tracker
    from flvis_tpu.geometry import camera
    from flvis_tpu.io.synthetic import PlanarScene, SceneConfig, orbit_trajectory

    dev = jax.devices()[0]
    print("device:", dev)

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
    CHUNK = 16
    imgs0 = jnp.stack([jnp.asarray(frames[i % 8][0]) for i in range(CHUNK)])
    imgs1 = jnp.stack([jnp.asarray(frames[i % 8][1]) for i in range(CHUNK)])
    imgs0 = jax.device_put(imgs0, dev)
    imgs1 = jax.device_put(imgs1, dev)

    st = jax.device_put(tracker.init_state(cfg), dev)
    st, _ = tracker.track_frames_scan(cfg, cam, st, imgs0, imgs1)
    jax.block_until_ready(st)

    # A: block_until_ready timing (what bench.py does).
    s1 = st
    n = 8
    t0 = time.perf_counter()
    for _ in range(n):
        s1, _ = tracker.track_frames_scan(cfg, cam, s1, imgs0, imgs1)
    jax.block_until_ready(s1)
    ta = time.perf_counter() - t0
    print(f"A block_until_ready: {1000*ta/(n*CHUNK):8.3f} ms/frame "
          f"({n*CHUNK/ta:9.1f} fps)")

    # B: force a host fetch of a value that depends on the whole chain.
    s2 = st
    t0 = time.perf_counter()
    for _ in range(n):
        s2, _ = tracker.track_frames_scan(cfg, cam, s2, imgs0, imgs1)
    val = float(np.asarray(s2.T_c_w.t[0])) + float(np.asarray(s2.table.uv[0, 0]))
    tb = time.perf_counter() - t0
    print(f"B fetch-to-host:     {1000*tb/(n*CHUNK):8.3f} ms/frame "
          f"({n*CHUNK/tb:9.1f} fps)  [val={val:.3f}]")

    # C: stepwise with fetch.
    s3 = st
    t0 = time.perf_counter()
    for i in range(32):
        s3, _ = tracker.track_frame(cfg, cam, s3, imgs0[i % CHUNK], imgs1[i % CHUNK])
    val = float(np.asarray(s3.T_c_w.t[0]))
    tc = time.perf_counter() - t0
    print(f"C stepwise + fetch:  {1000*tc/32:8.3f} ms/frame ({32/tc:9.1f} fps)"
          f"  [val={val:.3f}]")


if __name__ == "__main__":
    main()
