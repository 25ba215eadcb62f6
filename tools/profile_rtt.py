#!/usr/bin/env python
"""Measure axon tunnel per-dispatch overhead: warm jitted no-op, timed with
fetch-sync per call vs fetch-sync once after N async dispatches."""

import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flvis_tpu.utils.timing import sync

    dev = jax.devices()[0]
    print("device:", dev)

    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jax.device_put(jnp.float32(0.0), dev)
    sync(tiny(x))

    # per-call RTT with a fetch each time
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        x = tiny(x)
        v = float(np.asarray(x))
    t_sync = (time.perf_counter() - t0) / n
    print(f"tiny jit, fetch per call : {t_sync*1e3:9.2f} ms/call")

    # chained async dispatches, one fetch at the end
    t0 = time.perf_counter()
    for _ in range(50):
        x = tiny(x)
    v = float(np.asarray(x))
    t_async = (time.perf_counter() - t0) / 50
    print(f"tiny jit, fetch at end   : {t_async*1e3:9.2f} ms/call  (50 chained)")

    # medium program: one pyramid build, fetch each call
    from flvis_tpu.ops import image as imops

    img = jax.device_put(jnp.zeros((480, 752), jnp.float32), dev)

    @jax.jit
    def pyr(im):
        p = imops.build_grad_pyramid(im, 4)
        return sum(jnp.sum(x) for lev in p for x in lev)

    sync(pyr(img))
    t0 = time.perf_counter()
    for i in range(10):
        v = float(np.asarray(pyr(img + i)))
    t_p = (time.perf_counter() - t0) / 10
    print(f"grad pyramid, fetch/call : {t_p*1e3:9.2f} ms/call")

    # same pyramid repeated 64x inside one scan, one fetch
    @jax.jit
    def pyr_scan(im):
        def step(eps, _):
            p = imops.build_grad_pyramid(im + eps, 4)
            s = sum(jnp.sum(x) for lev in p for x in lev)
            return s * 1e-20, s
        _, ss = jax.lax.scan(step, jnp.float32(0.0), None, length=64)
        return jnp.sum(ss)

    sync(pyr_scan(img))
    t0 = time.perf_counter()
    for i in range(2):
        v = float(np.asarray(pyr_scan(img + i)))
    t_ps = (time.perf_counter() - t0) / (2 * 64)
    print(f"grad pyramid in scan x64 : {t_ps*1e3:9.2f} ms/iter")


if __name__ == "__main__":
    main()
