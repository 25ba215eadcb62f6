"""Dissect the fused-VIO chunk overhead vs the plain fused chunk.

The full system runs 144 fps without VIO and ~109 fps with it — a ~2.2
ms/frame gap.  This tool isolates where that gap lives on the real TPU:

  1. _chunk_fused           (frontend + BA + feedback)        — baseline
  2. _chunk_fused_vio       (+ IMU scan, feedforward, RP, bias feedback)
  3. vio-only scan          (imu_feed_batch + get_frame_state +
                             correction_from_vision, no images)
  4. imu_feed_batch-only scan (the P-sample Madgwick chain alone)

Run with the axon env untouched (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_vio_split.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from flvis_tpu.config import SystemConfig, FrontendConfig
    from flvis_tpu.geometry import camera, se3
    from flvis_tpu.io.synthetic import (PlanarScene, SceneConfig,
                                        orbit_trajectory, imu_from_trajectory)
    from flvis_tpu.pipeline.runner import SlamSystem
    from flvis_tpu.utils.timing import sync
    from flvis_tpu.vio import vimotion

    cfg = FrontendConfig(width=752, height=480, num_slots=256,
                         pyramid_levels=3, per_cell=16, min_distance=15.0,
                         margin=20, lk_radius=10, lk_iters=6)
    scfg = SceneConfig(width=752, height=480, fx=458.0, fy=458.0, cx=376.0,
                       cy=240.0, baseline=0.11)
    cam = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                      width=752, height=480)
    scene = PlanarScene(scfg, plane_depth=8.0, seed=0)
    CH = 64
    sys_poses = orbit_trajectory(8, step=0.02)
    sys_frames = [scene.render(R, t) for (R, t) in sys_poses]
    si0 = jnp.stack([jnp.asarray(sys_frames[i % 8][0]) for i in range(CH)])
    si1 = jnp.stack([jnp.asarray(sys_frames[i % 8][1]) for i in range(CH)])
    scfg_sys = SystemConfig(frontend=cfg)

    # ---- 1. plain fused chunk ------------------------------------------------
    slam = SlamSystem(scfg_sys, cam)
    for _ in range(2):
        slam.process_frames(si0, si1)
    sync(slam.fe_state)
    n = 4
    t0 = time.perf_counter()
    for _ in range(n):
        slam.process_frames(si0, si1)
    sync(slam.fe_state)
    base_ms = 1e3 * (time.perf_counter() - t0) / (n * CH)
    print(f"chunk_fused        : {base_ms:.3f} ms/frame ({1e3/base_ms:.1f} fps)")

    # ---- 2. fused VIO chunk --------------------------------------------------
    vposes = orbit_trajectory(CH, step=0.02)
    vio_frames = [scene.render(R, t) for (R, t) in vposes]
    t_imu, gyro, acc, frame_t = imu_from_trajectory(vposes, fps=20.0)
    accs, gyros, imuts = [], [], []
    prev = -np.inf
    for ft in frame_t:
        sel = (t_imu > prev) & (t_imu <= ft)
        accs.append(acc[sel]); gyros.append(gyro[sel]); imuts.append(t_imu[sel])
        prev = ft
    slam_v = SlamSystem(scfg_sys, cam, use_imu=True)
    vi0 = jnp.stack([jnp.asarray(f[0]) for f in vio_frames])
    vi1 = jnp.stack([jnp.asarray(f[1]) for f in vio_frames])

    def run_vio(rep):
        off = rep * (CH / 20.0 + 1.0)
        slam_v.process_frames_vio(vi0, vi1, frame_t + off,
                                  accs, gyros, [t + off for t in imuts])

    for r in range(2):
        run_vio(r)
    sync(slam_v.fe_state)
    t0 = time.perf_counter()
    for r in range(n):
        run_vio(2 + r)
    sync(slam_v.fe_state)
    vio_ms = 1e3 * (time.perf_counter() - t0) / (n * CH)
    print(f"chunk_fused_vio    : {vio_ms:.3f} ms/frame ({1e3/vio_ms:.1f} fps)"
          f"   [gap {vio_ms - base_ms:+.3f}]")

    # ---- 3. vio-only scan (no images) ---------------------------------------
    from flvis_tpu.pipeline.runner import pack_imu_frames
    vcfg = scfg_sys.vio
    T_i_c = se3.identity()
    pk_a, pk_g, pk_t, pk_v = pack_imu_frames(accs, gyros, imuts)
    ts = jnp.asarray(frame_t)

    import functools

    @functools.partial(jax.jit, static_argnames=("vc",))
    def vio_only(vc, st, ts, a, g, it, iv):
        def step(st, xs):
            t_img, a, g, it, iv = xs
            st = vimotion.imu_feed_batch(vc, st, a, g, it, iv)
            ff = vimotion.get_frame_state(st, t_img, T_i_c)
            st = vimotion.correction_from_vision(vc, st, t_img, ff.T_c_w,
                                                 T_i_c)
            return st, ff.ok
        st, oks = jax.lax.scan(step, st, (ts, a, g, it, iv))
        return st, oks

    vst = vimotion.init_state(vcfg)
    # warm init with one batch so the propagate branch is what's timed
    for r in range(2):
        off = r * (CH / 20.0 + 1.0)
        vst, _ = vio_only(vcfg, vst, ts + off, pk_a, pk_g, pk_t + off, pk_v)
    sync(vst.q)
    t0 = time.perf_counter()
    reps = 8
    for r in range(reps):
        off = (2 + r) * (CH / 20.0 + 1.0)
        vst, _ = vio_only(vcfg, vst, ts + off, pk_a, pk_g, pk_t + off, pk_v)
    sync(vst.q)
    vo_ms = 1e3 * (time.perf_counter() - t0) / (reps * CH)
    print(f"vio-only scan      : {vo_ms:.3f} ms/frame")

    # ---- 4. imu_feed_batch alone --------------------------------------------
    @functools.partial(jax.jit, static_argnames=("vc",))
    def imu_only(vc, st, a, g, it, iv):
        def step(st, xs):
            a, g, it, iv = xs
            st = vimotion.imu_feed_batch(vc, st, a, g, it, iv)
            return st, st.head
        st, _ = jax.lax.scan(step, st, (a, g, it, iv))
        return st

    vst2 = vimotion.init_state(vcfg)
    for r in range(2):
        off = r * (CH / 20.0 + 1.0)
        vst2 = imu_only(vcfg, vst2, pk_a, pk_g, pk_t + off, pk_v)
    sync(vst2.q)
    t0 = time.perf_counter()
    for r in range(reps):
        off = (2 + r) * (CH / 20.0 + 1.0)
        vst2 = imu_only(vcfg, vst2, pk_a, pk_g, pk_t + off, pk_v)
    sync(vst2.q)
    imu_ms = 1e3 * (time.perf_counter() - t0) / (reps * CH)
    print(f"imu_feed_batch only: {imu_ms:.3f} ms/frame "
          f"(P={pk_a.shape[1]} samples)")


if __name__ == "__main__":
    main()
