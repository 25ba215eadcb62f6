#!/usr/bin/env python
"""Sub-stage profile of the loop node's per-keyframe ingest on the real TPU.

The round-3 verdict: loop-on chunks cost ~5.6 ms per keyframe inline and the
ORB FAST+descriptor stage now dominates (sweep depth is ~1.2 ms).  This tool
times each stage of ops.orb.detect_and_compute plus the stereo sweep and the
BoW transform, 8-wide vmapped exactly like the fused block ingest program
(loop_closing._ingest_rows_body), so optimization effort lands on the
actually-dominant stage instead of a guess.  All timings fetch-verified (sync).
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from flvis_tpu.geometry import camera
    from flvis_tpu.io.synthetic import PlanarScene, SceneConfig, orbit_trajectory
    from flvis_tpu.ops import image as imops, orb, stereo
    from flvis_tpu.utils.timing import sync

    B, F = 8, 1000
    scfg = SceneConfig(width=752, height=480, fx=458.0, fy=458.0, cx=376.0,
                       cy=240.0, baseline=0.11)
    cam = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                      width=752, height=480)
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

    # --- stage isolation (each jitted separately, vmapped over B) ----------
    f_fast = jax.jit(jax.vmap(lambda im: orb.fast_score(im)))
    timed("fast_score", lambda: f_fast(il))

    def detect_part(im):
        h, w = im.shape
        score = orb.fast_score(im)
        pooled = jax.lax.reduce_window(score, -jnp.inf, jax.lax.max,
                                       (3, 3), (1, 1), "SAME")
        margin = 20
        yy = jnp.arange(h)[:, None]
        xx = jnp.arange(w)[None, :]
        ok = (yy >= margin) & (yy < h - margin) & (xx >= margin) & (xx < w - margin)
        score = jnp.where((score >= pooled) & ok, score, 0.0)
        tv, ti = jax.lax.approx_max_k(score.reshape(-1), F, recall_target=0.95)
        return tv, ti

    f_detect = jax.jit(jax.vmap(detect_part))
    timed("fast + NMS + approx_top_k", lambda: f_detect(il))

    f_blur = jax.jit(jax.vmap(
        lambda im: imops.gaussian_blur(im, sigma=2.0, ksize=7)))
    timed("gaussian_blur", lambda: f_blur(il))

    tv, ti = f_detect(il)
    uv = jnp.stack([(ti % 752).astype(jnp.float32),
                    (ti // 752).astype(jnp.float32)], axis=-1)
    blur = f_blur(il)
    f_patches = jax.jit(jax.vmap(
        lambda im, pts: imops.extract_patches_int(im, pts, orb._PATCH_R,
                                                  exact=False)))
    timed(f"extract_patches_int (N=1000, r={orb._PATCH_R})",
          lambda: f_patches(blur, uv))

    patches = f_patches(blur, uv)
    f_orient = jax.jit(jax.vmap(orb.orientations_from_patches))
    timed("orientations_from_patches", lambda: f_orient(patches))
    ang = f_orient(patches)
    f_brief = jax.jit(jax.vmap(orb.brief_from_patches))
    timed("brief_from_patches", lambda: f_brief(patches, ang))

    f_dc = jax.jit(jax.vmap(
        lambda im: orb.detect_and_compute(im, num_features=F)))
    timed("detect_and_compute TOTAL", lambda: f_dc(il))

    f_sweep = jax.jit(jax.vmap(
        lambda a, b: stereo.disparity_sweep(a, b)))
    timed("disparity_sweep", lambda: f_sweep(il, ir))

    # BoW transform at the real vocab size (lax.scan over rows as in
    # _ingest_rows_bow).
    from flvis_tpu.loop import bow

    rng = np.random.default_rng(0)
    desc = jnp.asarray(rng.integers(0, 2**32, (B, F, 8), dtype=np.uint64)
                       .astype(np.uint32))
    kpv = jnp.ones((B, F), bool)
    vocab = bow.Vocabulary(
        jnp.asarray(rng.uniform(-1, 1, (4096, 256)).astype(np.float32)),
        jnp.ones(4096, jnp.float32))

    def bow_block(desc, kpv):
        def one(_, i):
            return None, bow.transform(vocab, desc[i], kpv[i])
        _, bows = jax.lax.scan(one, None, jnp.arange(B))
        return bows

    f_bow = jax.jit(bow_block)
    timed("bow.transform x8 (V=4096)", lambda: f_bow(desc, kpv))

    # --- the real fused block program for reference ------------------------
    from flvis_tpu.loop import loop_closing as lcm

    K = 2048
    st = dict(
        uv=jnp.zeros((K, F, 2), jnp.float32),
        desc=jnp.zeros((K, F, 8), jnp.uint32),
        kpv=jnp.zeros((K, F), bool),
        pc=jnp.zeros((K, F, 3), jnp.float32),
        pcv=jnp.zeros((K, F), bool),
        qo=jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (K, 1)),
        to=jnp.zeros((K, 3), jnp.float32),
        q=jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (K, 1)),
        t=jnp.zeros((K, 3), jnp.float32),
    )
    db = jnp.zeros((K, 4096), jnp.float32)
    sel = jnp.arange(B, dtype=jnp.int32)
    rows = jnp.arange(B, dtype=jnp.int32)
    rv = jnp.ones(B, bool)
    qp = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (B, 1))
    tp = jnp.zeros((B, 3), jnp.float32)

    def run_fused():
        nonlocal st, db
        out = lcm._ingest_rows_bow(
            db, st["uv"], st["desc"], st["kpv"], st["pc"], st["pcv"],
            st["qo"], st["to"], st["q"], st["t"],
            vocab.words_pm1, vocab.idf, il, ir, sel, rows, rv, qp, tp,
            jnp.asarray([1.0, 0, 0, 0], jnp.float32),
            jnp.zeros(3, jnp.float32), cam,
            num_features=F, depth_mode=False)
        db = out[0]
        (st["uv"], st["desc"], st["kpv"], st["pc"], st["pcv"],
         st["qo"], st["to"], st["q"], st["t"]) = out[1:10]
        return out[10]

    timed("_ingest_rows_bow B=8 (fused, scan-of-vmap8)", run_fused)


if __name__ == "__main__":
    main()
