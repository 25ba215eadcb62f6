#!/usr/bin/env python
"""Attribute window-BA cost: vary iteration counts and stub the candidate
hot spots (batched 3x3 inv, 60x60 solve) to find what the 34 ms/keyframe
actually consists of."""

import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flvis_tpu.backend import window_ba
    from flvis_tpu.config import BackendConfig
    from flvis_tpu.geometry import camera, se3, so3
    from flvis_tpu.utils.timing import sync
    import jax.random as jr
    import dataclasses

    dev = jax.devices()[0]
    cam = camera.make(458.0, 458.0, 376.0, 240.0, 0.11, width=752, height=480)

    def build_state(bcfg):
        rng_np = np.random.default_rng(0)
        pts = jnp.asarray(rng_np.uniform([-4, -3, 4], [4, 3, 14], (600, 3)), jnp.float32)
        st = window_ba.empty(bcfg)
        for i in range(bcfg.window_size):
            q = so3.exp(jnp.asarray([0.0, 0.002 * i, 0.0]))
            C = jnp.asarray([0.1 * i, 0.0, 0.0])
            T = se3.SE3(q, -so3.rotate(q, C))
            pc = se3.transform_points(T, pts)
            uvr = jnp.stack([cam.fx * pc[:, 0] / pc[:, 2] + cam.cx,
                             cam.fy * pc[:, 1] / pc[:, 2] + cam.cy,
                             cam.fx * (pc[:, 0] - cam.baseline) / pc[:, 2] + cam.cx], -1)
            pkt = window_ba.KeyframePacket(
                frame_id=jnp.asarray(i, jnp.int32), q=T.q, t=T.t,
                lm_id=jnp.arange(100, 700, dtype=jnp.int32),
                lm_uv=uvr[:, :2], lm_ur=uvr[:, 2], lm_ur_mask=jnp.ones(600, bool),
                lm_pw=pts + jr.normal(jr.PRNGKey(i), (600, 3)) * 0.05,
                lm_mask=jnp.ones(600, bool))
            st = window_ba.add_keyframe(bcfg, st, pkt)
        return jax.device_put(st, dev)

    def timed(name, bcfg):
        st = build_state(bcfg)
        res = window_ba.optimize(bcfg, cam, st)
        sync(res.cost)
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            res = window_ba.optimize(bcfg, cam, st)
            sync(res.cost)
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"{name:40s} {ms:8.2f} ms", flush=True)
        return ms

    full = timed("full 12+8", BackendConfig())
    timed("iters 1+1", BackendConfig(iters1=1, iters2=1))
    timed("iters 6+4", BackendConfig(iters1=6, iters2=4))
    timed("iters 12+8 W=5", BackendConfig(window_size=5))
    timed("iters 12+8 L=256", BackendConfig(max_landmarks=256))


if __name__ == "__main__":
    main()
