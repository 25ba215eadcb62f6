#!/usr/bin/env python
"""Race the one-hot-matmul block gather against a two-stage TILED gather.

The current gather (ops/image._gather_blocks_matmul) pays
N x size x Hp x Wp MACs in its row-selection einsum — it contracts the FULL
padded image height per selected row.  The tiled variant first selects the
~(size/t + 2) row TILES that cover the band (contraction Hp/t), then columns,
then rows inside the slab: total work ~ N x nt x Hp x Wp / size lower.
Both are exact 0/1 selections for integer corners.

Shapes tested = the frontend's real LK gathers at 752x480 level 0:
  template patch gather: (3, H, W) stack, size 23
  search window gather:  (H, W), size 39
"""

import argparse
import functools
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
    H, W, PAD = 480, 752, 14
    hp, wp = H + 2 * PAD, W + 2 * PAD
    img = jax.device_put(jax.random.uniform(key, (hp, wp), jnp.float32, 0, 255), dev)
    img3 = jax.device_put(jax.random.uniform(key, (3, hp, wp), jnp.float32, 0, 255), dev)
    N = 256
    pts = jax.device_put(
        jax.random.randint(jax.random.fold_in(key, 1), (N, 2), 0, 400), dev)

    def timed(name, fn, reps=128):
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
        print(f"{name:56s} {us:10.1f} us", flush=True)
        return us

    hp_ = dict(precision="highest")

    def onehot_gather(padded, cx, cy, size):
        h2, w2 = padded.shape[-2:]
        dt = padded.dtype
        rows = cy[:, None] + jnp.arange(size)[None, :]
        cols = cx[:, None] + jnp.arange(size)[None, :]
        Ry = (rows[:, :, None] == jnp.arange(h2)[None, None, :]).astype(dt)
        Cx = (cols[:, :, None] == jnp.arange(w2)[None, None, :]).astype(dt)
        if padded.ndim == 2:
            rw = jnp.einsum("nrh,hw->nrw", Ry, padded, **hp_)
            return jnp.einsum("nrw,ncw->nrc", rw, Cx, **hp_)
        rw = jnp.einsum("nrh,khw->nkrw", Ry, padded, **hp_)
        return jnp.einsum("nkrw,ncw->nkrc", rw, Cx, **hp_)

    def tiled_gather(padded, cx, cy, size, tile):
        """Two-stage: row-tile slab selection, then columns, then rows."""
        h2, w2 = padded.shape[-2:]
        dt = padded.dtype
        nt = (size + 2 * tile - 2) // tile
        hpad = (-h2) % tile
        if hpad:
            padded = jnp.pad(padded, [(0, 0)] * (padded.ndim - 2)
                             + [(0, hpad), (0, 0)])
            h2 = h2 + hpad
        g = h2 // tile
        ti = cy // tile
        off = cy - ti * tile
        tsel = (ti[:, None] + jnp.arange(nt)[None, :])            # (N, nt)
        T = (tsel[:, :, None] == jnp.arange(g)[None, None, :]).astype(dt)
        cols = cx[:, None] + jnp.arange(size)[None, :]
        Cx = (cols[:, :, None] == jnp.arange(w2)[None, None, :]).astype(dt)
        rows_in = off[:, None] + jnp.arange(size)[None, :]        # (N, size)
        R2 = (rows_in[:, :, None] == jnp.arange(nt * tile)[None, None, :]).astype(dt)
        if padded.ndim == 2:
            Pr = padded.reshape(g, tile * w2)
            slab = jnp.einsum("ngh,hw->ngw", T, Pr, **hp_)        # (N, nt, t*W)
            slab = slab.reshape(-1, nt * tile, w2)
            sc = jnp.einsum("ngw,ncw->ngc", slab, Cx, **hp_)      # (N, nt*t, size)
            return jnp.einsum("nrg,ngc->nrc", R2, sc, **hp_)
        c = padded.shape[0]
        Pr = padded.reshape(c, g, tile * w2)
        slab = jnp.einsum("ngh,khw->nkgw", T, Pr, **hp_)
        slab = slab.reshape(-1, c, nt * tile, w2)
        sc = jnp.einsum("nkgw,ncw->nkgc", slab, Cx, **hp_)
        return jnp.einsum("nrg,nkgc->nkrc", R2, sc, **hp_)

    # Correctness check first (CPU or TPU, exact equality expected).
    cx = jnp.asarray(pts[:, 0], jnp.int32)
    cy = jnp.asarray(pts[:, 1], jnp.int32)
    for size in (23, 39):
        a = onehot_gather(img, cx, cy, size)
        for tile in (8, 16, 32):
            b = tiled_gather(img, cx, cy, size, tile)
            import numpy as np
            assert np.array_equal(np.asarray(a), np.asarray(b)), (size, tile)
        a3 = onehot_gather(img3, cx, cy, size)
        b3 = tiled_gather(img3, cx, cy, size, 8)
        import numpy as np
        assert np.array_equal(np.asarray(a3), np.asarray(b3)), ("3ch", size)
    print("exactness OK")

    print(f"device={dev}  N={N}  img={hp}x{wp}")
    for size in (23, 39):
        def f_one(eps, size=size):
            c = (cx + (eps * 0).astype(jnp.int32), cy)
            return jnp.sum(onehot_gather(img, c[0], c[1], size)) * 1e-6
        timed(f"one-hot  (H,W)    size={size}", f_one)
        for tile in (8, 16, 32):
            def f_t(eps, size=size, tile=tile):
                c = (cx + (eps * 0).astype(jnp.int32), cy)
                return jnp.sum(tiled_gather(img, c[0], c[1], size, tile)) * 1e-6
            timed(f"tiled t={tile:2d} (H,W)    size={size}", f_t)
    for size in (23,):
        def f_one3(eps, size=size):
            c = (cx + (eps * 0).astype(jnp.int32), cy)
            return jnp.sum(onehot_gather(img3, c[0], c[1], size)) * 1e-6
        timed(f"one-hot  (3,H,W)  size={size}", f_one3)
        for tile in (8, 16, 32):
            def f_t3(eps, size=size, tile=tile):
                c = (cx + (eps * 0).astype(jnp.int32), cy)
                return jnp.sum(tiled_gather(img3, c[0], c[1], size, tile)) * 1e-6
            timed(f"tiled t={tile:2d} (3,H,W)  size={size}", f_t3)

    # --- per-operand precision: the 0/1 selection matrix is EXACT in bf16,
    # so only the image operand needs multi-pass decomposition.
    from jax.lax import Precision

    def onehot_gather_p(padded, cx2, cy2, size, prec):
        h2, w2 = padded.shape[-2:]
        dt = padded.dtype
        rows = cy2[:, None] + jnp.arange(size)[None, :]
        cols = cx2[:, None] + jnp.arange(size)[None, :]
        Ry = (rows[:, :, None] == jnp.arange(h2)[None, None, :]).astype(dt)
        Cx = (cols[:, :, None] == jnp.arange(w2)[None, None, :]).astype(dt)
        if padded.ndim == 2:
            rw = jnp.einsum("nrh,hw->nrw", Ry, padded, precision=prec)
            return jnp.einsum("nrw,ncw->nrc", rw, Cx,
                              precision=(prec[1], prec[0]) if isinstance(prec, tuple) else prec)
        rw = jnp.einsum("nrh,khw->nkrw", Ry, padded, precision=prec)
        return jnp.einsum("nkrw,ncw->nkrc", rw, Cx,
                          precision=(prec[1], prec[0]) if isinstance(prec, tuple) else prec)

    import numpy as np
    ref = np.asarray(onehot_gather(img, cx, cy, 23))
    for name, prec in [
        ("(DEF,HIGHEST)", (Precision.DEFAULT, Precision.HIGHEST)),
        ("(DEF,HIGH)", (Precision.DEFAULT, Precision.HIGH)),
        ("HIGH", Precision.HIGH),
        ("DEFAULT", Precision.DEFAULT),
    ]:
        got = np.asarray(onehot_gather_p(img, cx, cy, 23, prec))
        err = float(np.max(np.abs(got - ref)))
        for size in (23, 39):
            def f_p(eps, size=size, prec=prec):
                c = (cx + (eps * 0).astype(jnp.int32), cy)
                return jnp.sum(onehot_gather_p(img, c[0], c[1], size, prec)) * 1e-6
            timed(f"one-hot {name:14s} (H,W) size={size} maxerr={err:.2e}", f_p)
        def f_p3(eps, prec=prec):
            c = (cx + (eps * 0).astype(jnp.int32), cy)
            return jnp.sum(onehot_gather_p(img3, c[0], c[1], 23, prec)) * 1e-6
        timed(f"one-hot {name:14s} (3,H,W) size=23", f_p3)


if __name__ == "__main__":
    main()
