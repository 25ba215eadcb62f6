#!/usr/bin/env python
"""Split the VIO+loop headline's per-chunk cost into stages.

BENCH r4 shows system_vio 124.9 fps vs system_vio_loop 93.7 fps — a
~0.17 s/chunk delta, while the known loop costs (32-wide fused ingest
~1.8-2.1 ms/KF x ~23 KFs + gate dispatch) only explain ~0.08-0.11 s.
This harness times, per chunk and fetch-verified (utils.timing.sync):
  - the fused VIO chunk program alone,
  - the loop ingest (add_keyframes_batch),
  - the candidate gate dispatch + deferred-row fetch,
and reports the keyframe count per chunk in each config (a cadence
difference between VIO and no-IMU paths would multiply ingest cost).
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from flvis_tpu.config import FrontendConfig, SystemConfig
    from flvis_tpu.geometry import camera
    from flvis_tpu.io.synthetic import (PlanarScene, SceneConfig,
                                        imu_from_trajectory,
                                        periodic_trajectory)
    from flvis_tpu.pipeline.runner import SlamSystem
    from flvis_tpu.utils.timing import sync
    import dataclasses as _dc

    cfg = FrontendConfig(width=752, height=480, num_slots=256,
                         pyramid_levels=3, per_cell=16, min_distance=15.0,
                         margin=20, lk_radius=10, lk_iters=6)
    scfg = SceneConfig(width=752, height=480, fx=458.0, fy=458.0, cx=376.0,
                       cy=240.0, baseline=0.11)
    cam = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                      width=752, height=480)
    scene = PlanarScene(scfg, plane_depth=8.0, seed=0)
    CH = 64
    vposes = periodic_trajectory(CH)
    frames = [scene.render(R, t) for (R, t) in vposes]
    t_imu, gyro, acc, frame_t = imu_from_trajectory(vposes, fps=20.0)
    accs, gyros, imuts = [], [], []
    prev = -np.inf
    for ft in frame_t:
        m = (t_imu > prev) & (t_imu <= ft)
        accs.append(acc[m]); gyros.append(gyro[m]); imuts.append(t_imu[m])
        prev = ft

    def u8(a):
        return np.clip(np.round(np.asarray(a)), 0, 255).astype(np.uint8)

    vi0 = jnp.stack([jnp.asarray(u8(f[0])) for f in frames])
    vi1 = jnp.stack([jnp.asarray(u8(f[1])) for f in frames])
    scfg_sys = SystemConfig(frontend=cfg)
    scfg_loop = scfg_sys.replace(
        loop=_dc.replace(scfg_sys.loop, nkf_closest=10**6))

    # --- VIO alone -------------------------------------------------------
    slam_v = SlamSystem(scfg_sys, cam, use_imu=True)

    def run_vio(s, rep):
        off = rep * (CH / 20.0 + 1.0)
        s.process_frames_vio(vi0, vi1, frame_t + off, accs, gyros,
                             [t + off for t in imuts])

    for r in range(2):
        run_vio(slam_v, r)
    sync(slam_v.fe_state)
    ts = []
    for r in range(3):
        t0 = time.perf_counter()
        run_vio(slam_v, 2 + r)
        sync(slam_v.fe_state)
        ts.append(time.perf_counter() - t0)
    kf_v = len(slam_v.keyframes) / 5.0
    print(f"vio chunk: {min(ts)*1e3:.1f} ms  (kf/chunk {kf_v:.1f})")

    # --- VIO + loop, stage-timed ----------------------------------------
    slam_vl = SlamSystem(scfg_loop, cam, use_imu=True, use_loop=True)
    lc = slam_vl.loop_closer
    stage = {"ingest": 0.0, "gate": 0.0, "n": 0}
    orig_add = lc.add_keyframes_batch
    orig_gate = lc.gate_candidates

    def timed_add(*a, **k):
        t0 = time.perf_counter()
        out = orig_add(*a, **k)
        sync(lc.kf_desc)
        stage["ingest"] += time.perf_counter() - t0
        return out

    def timed_gate(*a, **k):
        t0 = time.perf_counter()
        out = orig_gate(*a, **k)
        if out is not None:
            sync(out[-1] if isinstance(out, tuple) else out)
        stage["gate"] += time.perf_counter() - t0
        return out

    for r in range(6):
        run_vio(slam_vl, r)
    sync(slam_vl.fe_state)

    # Timed: whole chunk with sub-timers.
    lc.add_keyframes_batch = timed_add
    lc.gate_candidates = timed_gate
    ts2 = []
    for r in range(3):
        t0 = time.perf_counter()
        run_vio(slam_vl, 6 + r)
        sync(slam_vl.fe_state)
        ts2.append(time.perf_counter() - t0)
        stage["n"] += 1
    kf_vl = len(slam_vl.keyframes) / 9.0
    n = stage["n"]
    print(f"vio+loop chunk: {min(ts2)*1e3:.1f} ms  (kf/chunk {kf_vl:.1f})")
    print(f"  ingest (synced): {stage['ingest']/n*1e3:.1f} ms/chunk")
    print(f"  gate   (synced): {stage['gate']/n*1e3:.1f} ms/chunk")

    # Un-instrumented repeat (sub-syncs above serialize the async overlap;
    # this is the honest composed number).
    lc.add_keyframes_batch = orig_add
    lc.gate_candidates = orig_gate
    ts3 = []
    for r in range(3):
        t0 = time.perf_counter()
        run_vio(slam_vl, 9 + r)
        sync(slam_vl.fe_state)
        ts3.append(time.perf_counter() - t0)
    print(f"vio+loop chunk (clean): {min(ts3)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
