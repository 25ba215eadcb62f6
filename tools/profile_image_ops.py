#!/usr/bin/env python
"""Standalone timings of the per-frame image preprocessing ops."""

import argparse
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

    from flvis_tpu.ops import image as imops
    from flvis_tpu.utils.timing import sync

    dev = jax.devices()[0]
    REPS = args.reps
    key = jax.random.PRNGKey(0)
    pair = jax.device_put(
        jax.random.uniform(key, (2, 480, 752), jnp.float32, 0, 255), dev)

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

    print(f"device={dev}")
    timed("equalize_hist (2,H,W)",
          lambda eps: jnp.sum(imops.equalize_hist(pair + eps)) * 1e-9)
    timed("build_pyramid x3 (3,H,W) no grads",
          lambda eps: sum(jnp.sum(l) for l in
                          imops.build_pyramid(
                              jnp.concatenate([pair, pair[:1]]) + eps, 3)) * 1e-9)
    timed("scharr_gradients (3,H,W) full res",
          lambda eps: sum(jnp.sum(g) for g in imops.scharr_gradients(
              jnp.concatenate([pair, pair[:1]]) + eps)) * 1e-9)
    timed("build_grad_pyramid x3 (3,H,W)",
          lambda eps: sum(jnp.sum(a) for lv in imops.build_grad_pyramid(
              jnp.concatenate([pair, pair[:1]]) + eps, 3) for a in lv) * 1e-9)
    pts = jax.device_put(
        jax.random.uniform(key, (256, 2), jnp.float32, 30, 400), dev)
    timed("extract_patches_multi (3ch r=10, 256 pts)",
          lambda eps: jnp.sum(imops.extract_patches_multi(
              jnp.concatenate([pair, pair[:1]]), pts + eps, 10)) * 1e-9)
    timed("extract_windows (wd=39, 256 pts)",
          lambda eps: jnp.sum(imops.extract_windows(
              pair[0], pts + eps, 39)[0]) * 1e-9)


if __name__ == "__main__":
    main()
