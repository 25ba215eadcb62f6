#!/usr/bin/env python
"""Isolate the multiseq scan-of-vmap cliff: time track_frames_scan_batch
vs stepwise track_frame_batch across S and T."""

import time


def main():
    import jax
    import jax.numpy as jnp

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
    import numpy as np
    l, r, _ = scene.render(np.eye(3), np.zeros(3))
    img0 = jax.device_put(jnp.asarray(l), dev)
    img1 = jax.device_put(jnp.asarray(r), dev)

    for S in (1, 4, 16):
        cams = jax.tree.map(
            lambda a: jnp.broadcast_to(jnp.asarray(a), (S,) + jnp.shape(jnp.asarray(a))), cam)
        i0 = jnp.stack([jnp.roll(img0, 7 * s, axis=1) for s in range(S)])
        i1 = jnp.stack([jnp.roll(img1, 7 * s, axis=1) for s in range(S)])
        keys = jax.random.split(jax.random.PRNGKey(0), S)
        st = multiseq.init_states(cfg, S)
        for _ in range(2):
            st, _ = multiseq.track_frame_batch(cfg, cams, st, i0, i1, keys)
        sync(st)
        n = 4
        t0 = time.perf_counter()
        for _ in range(n):
            st, _ = multiseq.track_frame_batch(cfg, cams, st, i0, i1, keys)
        sync(st)
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"stepwise  S={S:3d}        {ms:9.1f} ms/step "
              f"({1000*n*S/( (time.perf_counter()-t0)*1000):6.1f} agg fps)",
              flush=True)

        for T in (2, 8):
            i0s = jnp.stack([jnp.stack([jnp.roll(img0, 7 * s + t, axis=1)
                                        for t in range(T)]) for s in range(S)])
            i1s = jnp.stack([jnp.stack([jnp.roll(img1, 7 * s + t, axis=1)
                                        for t in range(T)]) for s in range(S)])
            vst = multiseq.init_states(cfg, S)
            vst, _ = multiseq.track_frames_scan_batch(cfg, cams, vst, i0s, i1s)
            sync(vst)
            n = 2
            t0 = time.perf_counter()
            for _ in range(n):
                vst, _ = multiseq.track_frames_scan_batch(cfg, cams, vst, i0s, i1s)
            sync(vst)
            ms = (time.perf_counter() - t0) / (n * T) * 1e3
            print(f"scan      S={S:3d} T={T:2d}  {ms:9.1f} ms/step-frame "
                  f"({n*T*S/(time.perf_counter()-t0):6.1f} agg fps)", flush=True)


if __name__ == "__main__":
    main()
