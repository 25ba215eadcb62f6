#!/usr/bin/env python
"""Scaling of vmap-of-dynamic_slice block gathers: per-slice overhead vs
bytes, to decide the gather redesign (one-hot matmul vs Pallas DMA)."""

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from flvis_tpu.utils.timing import sync

    dev = jax.devices()[0]
    key = jax.random.PRNGKey(0)
    img = jax.device_put(
        jax.random.uniform(key, (512, 768), jnp.float32, 0, 255), dev)

    def timed(name, fn, reps=256):
        @jax.jit
        def run():
            def step(eps, _):
                s = fn(eps)
                return s * 1e-20, s
            _, ss = jax.lax.scan(step, jnp.float32(0.0), None, length=reps)
            return jnp.sum(ss)

        sync(run())
        n_outer = 2
        t0 = time.perf_counter()
        for _ in range(n_outer):
            sync(run())
        us = (time.perf_counter() - t0) / (n_outer * reps) * 1e6
        print(f"{name:52s} {us:10.1f} us", flush=True)
        return us

    print(f"device={dev}")
    for n in (32, 64, 128, 256, 512):
        pts = jax.device_put(
            jax.random.randint(jax.random.fold_in(key, n), (n, 2), 16, 400), dev)

        def f(eps, pts=pts, n=n):
            c = (pts + (eps * 0).astype(jnp.int32)).astype(jnp.int32)
            out = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
                img, (yy, xx), (24, 24)))(c[:, 1], c[:, 0])
            return jnp.sum(out) * 1e-6
        timed(f"vmap dyn_slice  N={n:4d}  24x24", f)

    pts = jax.device_put(jax.random.randint(key, (256, 2), 16, 400), dev)
    for size in (8, 24, 48, 96):
        def f(eps, size=size):
            c = (pts + (eps * 0).astype(jnp.int32)).astype(jnp.int32)
            out = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
                img, (yy, xx), (size, size)))(c[:, 1], c[:, 0])
            return jnp.sum(out) * 1e-6
        timed(f"vmap dyn_slice  N=256  {size}x{size}", f)

    # One-hot matmul gather: rows then cols, f32 highest.
    import numpy as np
    for n, size in ((256, 24), (256, 48)):
        pts_n = jax.device_put(
            jax.random.randint(key, (n, 2), 16, 400), dev)

        def f(eps, n=n, size=size):
            c = (pts_n + (eps * 0).astype(jnp.int32)).astype(jnp.int32)
            h, w = img.shape
            rows = c[:, 1, None] + jnp.arange(size)[None, :]      # (N, size)
            cols = c[:, 0, None] + jnp.arange(size)[None, :]
            Ry = (rows[:, :, None] == jnp.arange(h)[None, None, :]).astype(img.dtype)
            Cx = (cols[:, :, None] == jnp.arange(w)[None, None, :]).astype(img.dtype)
            rw = jnp.einsum("nrh,hw->nrw", Ry, img, precision="highest")
            out = jnp.einsum("nrw,ncw->nrc", rw, Cx, precision="highest")
            return jnp.sum(out) * 1e-6
        timed(f"one-hot matmul  N={n}  {size}x{size} f32-highest", f)

        def fb(eps, n=n, size=size):
            c = (pts_n + (eps * 0).astype(jnp.int32)).astype(jnp.int32)
            h, w = img.shape
            rows = c[:, 1, None] + jnp.arange(size)[None, :]
            cols = c[:, 0, None] + jnp.arange(size)[None, :]
            Ry = (rows[:, :, None] == jnp.arange(h)[None, None, :]).astype(jnp.bfloat16)
            Cx = (cols[:, :, None] == jnp.arange(w)[None, None, :]).astype(jnp.bfloat16)
            rw = jnp.einsum("nrh,hw->nrw", Ry, img.astype(jnp.bfloat16))
            out = jnp.einsum("nrw,ncw->nrc", rw, Cx)
            return jnp.sum(out.astype(jnp.float32)) * 1e-6
        timed(f"one-hot matmul  N={n}  {size}x{size} bf16", fb)


if __name__ == "__main__":
    main()
