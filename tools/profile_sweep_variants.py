#!/usr/bin/env python
"""Race disparity-sweep formulations on the real TPU.

The sweep is ~1.6 ms/KF — the largest single stage of the loop-node ingest
(tools/profile_ingest_stages.py).  Bandwidth math says the (64, 240, 376)
cost volume should cost ~0.5 ms, so the gap is formulation overhead.  This
tool times (a) the stage breakdown (volume+box only, +argmin/min, full) and
(b) alternatives: f32 reductions, box radius 3, cumsum (integral-image) box,
and a fused min+neighbour pass.  8-wide vmapped like the real ingest.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from flvis_tpu.io.synthetic import PlanarScene, SceneConfig, orbit_trajectory
    from flvis_tpu.ops import image as imops, stereo
    from flvis_tpu.utils.timing import sync

    B = 8
    scfg = SceneConfig(width=752, height=480, fx=458.0, fy=458.0, cx=376.0,
                       cy=240.0, baseline=0.11)
    scene = PlanarScene(scfg, plane_depth=8.0, seed=0)
    poses = orbit_trajectory(B, step=0.03)
    frames = [scene.render(R, t) for (R, t) in poses]
    il = jnp.stack([jnp.asarray(f[0]) for f in frames])
    ir = jnp.stack([jnp.asarray(f[1]) for f in frames])

    def timed(label, fn, reps=8):
        fn()
        sync(fn())
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        sync(out)
        dt = (time.perf_counter() - t0) / reps * 1000.0
        print(f"{label:44s} {dt:8.2f} ms/block  {dt / B:7.3f} ms/KF")
        return dt

    d_max, radius = 64, 4

    def half(a):
        h2, w2 = a.shape[0] // 2, a.shape[1] // 2
        a = a[: 2 * h2, : 2 * w2]
        return 0.25 * (a[0::2, 0::2] + a[1::2, 0::2]
                       + a[0::2, 1::2] + a[1::2, 1::2])

    def volume(img_l, img_r, rad=radius):
        L, R = half(img_l), half(img_r)
        Wh = L.shape[1]
        Rp = jnp.pad(R, ((0, 0), (d_max, 0)), mode="edge")
        shifted = jnp.stack([Rp[:, d_max - d: d_max - d + Wh]
                             for d in range(d_max)])
        cost = stereo._box2d(jnp.abs(L[None] - shifted).astype(jnp.bfloat16),
                             rad)
        return cost, L

    f_vol = jax.jit(jax.vmap(lambda a, b: volume(a, b)[0].astype(jnp.float32)
                             .sum(axis=(1, 2))))
    timed("volume+box only", lambda: f_vol(il, ir))

    def diff_only(img_l, img_r):
        L, R = half(img_l), half(img_r)
        Wh = L.shape[1]
        Rp = jnp.pad(R, ((0, 0), (d_max, 0)), mode="edge")
        shifted = jnp.stack([Rp[:, d_max - d: d_max - d + Wh]
                             for d in range(d_max)])
        return jnp.abs(L[None] - shifted).astype(jnp.bfloat16) \
                  .astype(jnp.float32).sum(axis=(1, 2))

    f_diff = jax.jit(jax.vmap(diff_only))
    timed("diff volume only (no box)", lambda: f_diff(il, ir))

    def vol_f32(img_l, img_r):
        L, R = half(img_l), half(img_r)
        Wh = L.shape[1]
        Rp = jnp.pad(R, ((0, 0), (d_max, 0)), mode="edge")
        shifted = jnp.stack([Rp[:, d_max - d: d_max - d + Wh]
                             for d in range(d_max)])
        return stereo._box2d(jnp.abs(L[None] - shifted), radius) \
                     .sum(axis=(1, 2))

    f_v32 = jax.jit(jax.vmap(vol_f32))
    timed("volume+box only (all f32)", lambda: f_v32(il, ir))

    f_d48 = jax.jit(jax.vmap(
        lambda a, b: stereo.disparity_sweep(a, b, d_max=48)))
    timed("FULL d_max=48", lambda: f_d48(il, ir))

    def vol_argmin(img_l, img_r):
        cost, _ = volume(img_l, img_r)
        return (jnp.argmin(cost, axis=0),
                jnp.min(cost, axis=0).astype(jnp.float32))

    f_va = jax.jit(jax.vmap(vol_argmin))
    timed("volume+box+argmin/min", lambda: f_va(il, ir))

    f_cur = jax.jit(jax.vmap(lambda a, b: stereo.disparity_sweep(a, b)))
    timed("FULL current (bf16 reductions)", lambda: f_cur(il, ir))

    # f32 reduction variant (the pre-round-4 formulation).
    def full_f32(img_l, img_r):
        cost, L = volume(img_l, img_r)
        cost = cost.astype(jnp.float32)
        best = jnp.argmin(cost, axis=0)
        d_idx = jnp.arange(d_max)[:, None, None]
        c_best = jnp.min(cost, axis=0)
        db = d_idx - best[None]
        cm = jnp.sum(jnp.where(db == -1, cost, 0.0), axis=0)
        cp = jnp.sum(jnp.where(db == 1, cost, 0.0), axis=0)
        denom = cm + cp - 2.0 * c_best
        delta = jnp.where(denom > 1e-3,
                          0.5 * (cm - cp) / jnp.maximum(denom, 1e-3), 0.0)
        delta = jnp.clip(delta, -0.5, 0.5)
        disp_h = best.astype(jnp.float32) + delta
        area = float((2 * radius + 1) ** 2)
        texture = stereo._box2d(jnp.abs(L - imops.box_filter(L, radius)),
                                radius)
        c_second = jnp.min(jnp.where(jnp.abs(db) > 2, cost, jnp.inf), axis=0)
        valid = ((texture > 4.0 * area)
                 & (c_second > 1.05 * c_best + 1e-3)
                 & (best > 0) & (best < d_max - 1))
        return 2.0 * disp_h, valid

    f_f32 = jax.jit(jax.vmap(full_f32))
    timed("FULL f32 reductions", lambda: f_f32(il, ir))

    # One-pass neighbours: compute cm/cp/c_second with shifted-volume mins
    # instead of best-dependent masks (no second dependency on argmin).
    def full_shift(img_l, img_r):
        cost, L = volume(img_l, img_r)
        big = jnp.bfloat16(6.0e4)
        c_best = jnp.min(cost, axis=0)
        best = jnp.argmin(cost, axis=0)
        cpad = jnp.concatenate([jnp.full((1,) + cost.shape[1:], big),
                                cost,
                                jnp.full((1,) + cost.shape[1:], big)], axis=0)
        cm = cpad[:-2]          # cost[d-1] aligned at d
        cp = cpad[2:]           # cost[d+1]
        # gather along d=best via one-hot (same trick, fused with the mins)
        d_idx = jnp.arange(d_max)[:, None, None]
        sel = (d_idx == best[None])
        z = jnp.bfloat16(0)
        cmv = jnp.sum(jnp.where(sel, cm, z), axis=0, dtype=jnp.float32)
        cpv = jnp.sum(jnp.where(sel, cp, z), axis=0, dtype=jnp.float32)
        c_bf = c_best.astype(jnp.float32)
        denom = cmv + cpv - 2.0 * c_bf
        delta = jnp.where(denom > 1e-3,
                          0.5 * (cmv - cpv) / jnp.maximum(denom, 1e-3), 0.0)
        disp_h = best.astype(jnp.float32) + jnp.clip(delta, -0.5, 0.5)
        area = float((2 * radius + 1) ** 2)
        texture = stereo._box2d(jnp.abs(L - imops.box_filter(L, radius)),
                                radius)
        db = d_idx - best[None]
        c_second = jnp.min(jnp.where(jnp.abs(db) > 2, cost,
                                     jnp.bfloat16(jnp.inf)), axis=0)
        valid = ((texture > 4.0 * area)
                 & (c_second.astype(jnp.float32) > 1.05 * c_bf + 1e-3)
                 & (best > 0) & (best < d_max - 1))
        return 2.0 * disp_h, valid

    f_sh = jax.jit(jax.vmap(full_shift))
    timed("FULL shifted-neighbour", lambda: f_sh(il, ir))

    # radius-3 box (7x7 support)
    def full_r3(img_l, img_r):
        return stereo.disparity_sweep(img_l, img_r, radius=3)

    f_r3 = jax.jit(jax.vmap(full_r3))
    timed("FULL radius=3", lambda: f_r3(il, ir))

    # cumsum (integral image) box along both axes
    def box_cumsum(v, rad):
        k = 2 * rad + 1
        vp = jnp.pad(v, ((0, 0), (rad + 1, rad), (0, 0)))
        c = jnp.cumsum(vp.astype(jnp.float32), axis=1)
        vy = c[:, k:] - c[:, :-k]
        vp = jnp.pad(vy, ((0, 0), (0, 0), (rad + 1, rad)))
        c = jnp.cumsum(vp, axis=2)
        return c[:, :, k:] - c[:, :, :-k]

    def full_cumsum(img_l, img_r):
        L, R = half(img_l), half(img_r)
        Wh = L.shape[1]
        Rp = jnp.pad(R, ((0, 0), (d_max, 0)), mode="edge")
        shifted = jnp.stack([Rp[:, d_max - d: d_max - d + Wh]
                             for d in range(d_max)])
        cost = box_cumsum(jnp.abs(L[None] - shifted), radius)
        best = jnp.argmin(cost, axis=0)
        return best

    f_cs = jax.jit(jax.vmap(full_cumsum))
    timed("volume+cumsum-box+argmin", lambda: f_cs(il, ir))

    # MXU shift: the 64 lane-offset slices are relayout-bound (the diff
    # volume alone is 1.13 ms/KF); a (D, Wp, Wh) one-hot shift matrix turns
    # ALL candidate shifts into ONE batched matmul.
    def shift_matmul(img_l, img_r):
        L, R = half(img_l), half(img_r)
        Hh, Wh = L.shape
        Rp = jnp.pad(R, ((0, 0), (d_max, 0)), mode="edge")
        Wp = Wh + d_max
        dd = jnp.arange(d_max)[:, None, None]
        vv = jnp.arange(Wh)[None, None, :]
        ww = jnp.arange(Wp)[None, :, None]
        S = (ww == vv + d_max - dd).astype(jnp.bfloat16)   # (D, Wp, Wh)
        shifted = jnp.einsum("hw,dwv->dhv", Rp.astype(jnp.bfloat16), S,
                             precision="default")
        cost = stereo._box2d(
            jnp.abs(L.astype(jnp.bfloat16)[None] - shifted), radius)
        return cost

    f_mm = jax.jit(jax.vmap(
        lambda a, b: shift_matmul(a, b).astype(jnp.float32).sum(axis=(1, 2))))
    timed("volume+box via MXU shift-matmul", lambda: f_mm(il, ir))

    def full_mm(img_l, img_r):
        cost = shift_matmul(img_l, img_r)
        L = half(img_l)
        best = jnp.argmin(cost, axis=0)
        d_idx = jnp.arange(d_max)[:, None, None]
        c_best = jnp.min(cost, axis=0).astype(jnp.float32)
        db = d_idx - best[None]
        z = jnp.bfloat16(0)
        cm = jnp.sum(jnp.where(db == -1, cost, z), axis=0, dtype=jnp.float32)
        cp = jnp.sum(jnp.where(db == 1, cost, z), axis=0, dtype=jnp.float32)
        denom = cm + cp - 2.0 * c_best
        delta = jnp.where(denom > 1e-3,
                          0.5 * (cm - cp) / jnp.maximum(denom, 1e-3), 0.0)
        disp_h = best.astype(jnp.float32) + jnp.clip(delta, -0.5, 0.5)
        area = float((2 * radius + 1) ** 2)
        texture = stereo._box2d(jnp.abs(L - imops.box_filter(L, radius)),
                                radius)
        c_second = jnp.min(jnp.where(jnp.abs(db) > 2, cost,
                                     jnp.bfloat16(jnp.inf)), axis=0)
        valid = ((texture > 4.0 * area)
                 & (c_second.astype(jnp.float32) > 1.05 * c_best + 1e-3)
                 & (best > 0) & (best < d_max - 1))
        return 2.0 * disp_h, valid

    f_fmm = jax.jit(jax.vmap(full_mm))
    timed("FULL via MXU shift-matmul", lambda: f_fmm(il, ir))

    # numeric check vs current formulation
    da, va = f_cur(il, ir)
    db_, vb = f_fmm(il, ir)
    da, va, db_, vb = map(np.asarray, (da, va, db_, vb))
    both = va & vb
    print("valid agree frac:", (va == vb).mean(),
          " disp maxdiff(valid):", np.abs(da - db_)[both].max()
          if both.any() else "n/a")


if __name__ == "__main__":
    main()
