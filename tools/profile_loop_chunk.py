#!/usr/bin/env python
"""Profile the chunked loop-node path on the real TPU: where do the
~3 s/chunk go?  Times each loop-side program in isolation (fetch-verified)
and the end-to-end chunk with/without the loop node, printing per-stage
ms so regressions are attributable (BENCH r03 intermediate: 17.9 fps with
loop vs 144 without — worse than the round-2 host loop it replaced)."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from flvis_tpu.config import FrontendConfig, SystemConfig
    from flvis_tpu.geometry import camera
    from flvis_tpu.io.synthetic import (PlanarScene, SceneConfig,
                                        orbit_trajectory)
    from flvis_tpu.pipeline.runner import SlamSystem
    from flvis_tpu.utils.timing import sync

    cfg = FrontendConfig(width=752, height=480, num_slots=256,
                         pyramid_levels=3, per_cell=16, min_distance=15.0,
                         margin=20, lk_radius=10, lk_iters=6)
    scfg = SceneConfig(width=752, height=480, fx=458.0, fy=458.0, cx=376.0,
                       cy=240.0, baseline=0.11)
    cam = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                      width=752, height=480)
    scene = PlanarScene(scfg, plane_depth=8.0, seed=0)
    CH = 64
    # 64 UNIQUE frames (matches bench.py's loop section): keyframe counts
    # then jitter chunk to chunk, exercising the fixed-block program shapes.
    poses = orbit_trajectory(CH, step=0.02)
    frames = [scene.render(R, t) for (R, t) in poses]
    si0 = jnp.stack([jnp.asarray(frames[i][0]) for i in range(CH)])
    si1 = jnp.stack([jnp.asarray(frames[i][1]) for i in range(CH)])
    scfg_sys = SystemConfig(frontend=cfg)

    def timed(label, fn, out_of=None, reps=3):
        fn()  # warm
        sync_target = fn()
        sync(sync_target)
        t0 = time.perf_counter()
        for _ in range(reps):
            sync_target = fn()
        sync(sync_target)
        dt = (time.perf_counter() - t0) / reps * 1000.0
        print(f"{label:48s} {dt:9.1f} ms")
        return dt

    # --- baseline chunk (no loop) ---
    slam = SlamSystem(scfg_sys, cam)
    timed("chunk64 no-loop", lambda: (slam.process_frames(si0, si1),
                                      slam.fe_state)[1])

    # --- loop-enabled chunk, stage by stage ---
    # nkf_closest unreachable: replaying the same frames manufactures loop
    # events every chunk (identical images N keyframes apart) — a verify+PGO
    # storm no real sequence produces; this profiles the steady path.
    import dataclasses as _dc

    scfg_loop = scfg_sys.replace(
        loop=_dc.replace(scfg_sys.loop, nkf_closest=10**6))
    slam_l = SlamSystem(scfg_loop, cam, use_loop=True)
    t_first = []
    for i in range(6):
        t0 = time.perf_counter()
        slam_l.process_frames(si0, si1)
        sync(slam_l.fe_state)
        dt = (time.perf_counter() - t0) * 1000.0
        t_first.append(dt)
        lc = slam_l.loop_closer
        print(f"chunk64 WITH loop, call {i}: {dt:9.1f} ms  "
              f"(count={lc.count}, M this chunk~{lc.count - (0 if i == 0 else c_prev)})")
        c_prev = lc.count

    # --- isolated loop programs on realistic shapes ---
    from flvis_tpu.loop import loop_closing as lcm

    lc = slam_l.loop_closer
    Mp = 8
    sel = jnp.asarray(np.arange(Mp) % CH, jnp.int32)
    rows = jnp.asarray(np.arange(Mp), jnp.int32)
    rv = jnp.ones(Mp, bool)
    qp = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (Mp, 1))
    tp = jnp.zeros((Mp, 3), jnp.float32)

    def run_ingest():
        out = lcm._ingest_rows(
            lc.kf_uv, lc.kf_desc, lc.kf_kp_valid, lc.kf_pc, lc.kf_pc_valid,
            lc.kf_q_odom, lc.kf_t_odom, lc.kf_q, lc.kf_t,
            si0, si1, sel, rows, rv, qp, tp,
            lc.T_map_odom.q, lc.T_map_odom.t, cam,
            num_features=lc.cfg.num_orb_features, depth_mode=False)
        (lc.kf_uv, lc.kf_desc, lc.kf_kp_valid, lc.kf_pc, lc.kf_pc_valid,
         lc.kf_q_odom, lc.kf_t_odom, lc.kf_q, lc.kf_t) = out[:9]
        return out[9]

    timed(f"_ingest_rows B8 x5 F={lc.cfg.num_orb_features}", run_ingest)

    def run_bow():
        lc.bow_db = lcm._bow_rows(lc.bow_db, lc.vocab.words_pm1,
                                  lc.vocab.idf, lc.kf_desc, lc.kf_kp_valid,
                                  rows, rv)
        return lc.bow_db

    timed(f"_bow_rows Mp={Mp} V={lc.cfg.vocab_words}", run_bow)

    ks = jnp.asarray(np.arange(60, 60 + Mp), jnp.int32)
    los = jnp.zeros(Mp, jnp.int32)
    his = jnp.asarray(np.arange(10, 10 + Mp), jnp.int32)

    def run_gate():
        return lcm._gate_rows(lc.bow_db, jnp.arange(lc.bow_db.shape[0])
                              < lc.count, ks, los, his,
                              jnp.asarray(50, jnp.int32))

    timed(f"_gate_rows M={Mp} K={lc.bow_db.shape[0]}", run_gate)

    # single-keyframe stepwise ingest for comparison
    def run_single():
        return lcm._ingest(si0[0], si1[0], cam,
                           num_features=lc.cfg.num_orb_features,
                           depth_mode=False)

    timed(f"_ingest single F={lc.cfg.num_orb_features}", run_single)


if __name__ == "__main__":
    main()
