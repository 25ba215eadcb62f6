#!/usr/bin/env python
"""Is the multiseq scan cliff recompilation or a slow executable?
AOT-compile track_frames_scan_batch and time the compiled callable;
also log per-call wall times for the jit path."""

import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flvis_tpu.config import FrontendConfig
    from flvis_tpu.geometry import camera
    from flvis_tpu.io.synthetic import PlanarScene, SceneConfig
    from flvis_tpu.parallel import multiseq
    from flvis_tpu.utils.timing import sync

    dev = jax.devices()[0]
    cfg = FrontendConfig(width=752, height=480, num_slots=256, pyramid_levels=3,
                         per_cell=16, min_distance=15.0, margin=20,
                         lk_radius=10, lk_iters=6)
    scfg = SceneConfig(width=752, height=480, fx=458.0, fy=458.0, cx=376.0,
                       cy=240.0, baseline=0.11)
    cam = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                      width=752, height=480)
    scene = PlanarScene(scfg, plane_depth=8.0, seed=0)
    l, r, _ = scene.render(np.eye(3), np.zeros(3))
    img0 = jax.device_put(jnp.asarray(l), dev)
    img1 = jax.device_put(jnp.asarray(r), dev)

    S, T = 1, 4
    cams = jax.tree.map(
        lambda a: jnp.broadcast_to(jnp.asarray(a), (S,) + jnp.shape(jnp.asarray(a))), cam)
    i0s = jnp.stack([jnp.stack([jnp.roll(img0, 7 * s + t, axis=1)
                                for t in range(T)]) for s in range(S)])
    i1s = jnp.stack([jnp.stack([jnp.roll(img1, 7 * s + t, axis=1)
                                for t in range(T)]) for s in range(S)])
    vst = multiseq.init_states(cfg, S)

    print("jit path, per-call wall:", flush=True)
    for k in range(4):
        t0 = time.perf_counter()
        vst2, _ = multiseq.track_frames_scan_batch(cfg, cams, vst, i0s, i1s)
        sync(vst2)
        print(f"  call {k}: {time.perf_counter()-t0:8.2f} s", flush=True)

    print("AOT path:", flush=True)
    t0 = time.perf_counter()
    lowered = multiseq.track_frames_scan_batch.lower(cfg, cams, vst, i0s, i1s)
    compiled = lowered.compile()
    print(f"  compile: {time.perf_counter()-t0:8.2f} s", flush=True)
    for k in range(3):
        t0 = time.perf_counter()
        out = compiled(cams, vst, i0s, i1s)
        sync(out[0])
        print(f"  call {k}: {time.perf_counter()-t0:8.2f} s", flush=True)


if __name__ == "__main__":
    main()
