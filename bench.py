#!/usr/bin/env python
"""Benchmark: frontend tracking throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "frontend_frames_per_s", "value": N, "unit": "frames/s",
   "vs_baseline": N / 30.0, ...}

Baseline: the reference FLVIS runs its KITTI replay at 30 Hz on CPU and the
README advises dropping to 10-15 Hz when tracking/optimization struggles
(/root/reference/launch/flvis_kitti.launch:6, README.md:149-152), so 30
frames/s is the reference real-time envelope recorded in BASELINE.md.

The measured step is the FULL jitted frontend program at EuRoC resolution
(752×480, 256 landmark slots): pyramid builds for both stereo images,
pyramidal LK (temporal + stereo depth), fundamental RANSAC, motion-only BA,
MAD gating, grid redetection, and depth-innovation fusion.  Host→device
image transfer is included (it is part of the real pipeline).

Synchronization: on the remote-TPU (axon) backend jax.block_until_ready can
return before the device has finished; every timed region therefore ends
with utils.timing.sync(), which fetches a value data-dependent on the
result — the only honest barrier (see utils/timing.py).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from flvis_tpu.config import FrontendConfig
    from flvis_tpu.frontend import tracker
    from flvis_tpu.geometry import camera
    from flvis_tpu.io.synthetic import PlanarScene, SceneConfig, orbit_trajectory
    from flvis_tpu.utils.timing import sync

    dev = jax.devices()[0]

    # EuRoC-like configuration (752×480, 16-cell grid, 256 slots).
    # Operating point from tools/sweep_operating_point.py: 6 GN iterations /
    # 3 pyramid levels matches or beats the 10/4 point on synthetic ATE
    # (0.12 vs 0.30 cm) while cutting the dominant sequential GN chain.
    cfg = FrontendConfig(width=752, height=480, num_slots=256, pyramid_levels=3,
                         per_cell=16, min_distance=15.0, margin=20,
                         lk_radius=10, lk_iters=6)
    scfg = SceneConfig(width=752, height=480, fx=458.0, fy=458.0, cx=376.0, cy=240.0,
                      baseline=0.11)
    cam = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                      width=752, height=480)
    scene = PlanarScene(scfg, plane_depth=8.0, seed=0)
    poses = orbit_trajectory(8, step=0.03)
    frames = [scene.render(R, t) for (R, t) in poses]
    imgs = [
        (jax.device_put(jnp.asarray(l), dev), jax.device_put(jnp.asarray(r), dev))
        for (l, r, _) in frames
    ]

    state = tracker.init_state(cfg)
    state = jax.device_put(state, dev)

    # Warmup / compile.
    for i in range(3):
        state, out = tracker.track_frame(cfg, cam, state, *imgs[i % len(imgs)])
    sync(state)

    n_iters = 12
    t0 = time.perf_counter()
    for i in range(n_iters):
        state, out = tracker.track_frame(cfg, cam, state, *imgs[i % len(imgs)])
    sync(state)
    elapsed = time.perf_counter() - t0

    fps = n_iters / elapsed

    # --- scan-over-frames replay mode (chunked dispatch) ---------------------
    # One lax.scan program over a CHUNK frames: per-frame host dispatch
    # disappears; this is the dataset-replay fast path.
    CHUNK = 16
    imgs0_chunk = jnp.stack([imgs[i % len(imgs)][0] for i in range(CHUNK)])
    imgs1_chunk = jnp.stack([imgs[i % len(imgs)][1] for i in range(CHUNK)])
    sstate = jax.device_put(tracker.init_state(cfg), dev)
    sstate, _ = tracker.track_frames_scan(cfg, cam, sstate, imgs0_chunk, imgs1_chunk)
    sync(sstate)
    n_chunks = 3
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        sstate, _ = tracker.track_frames_scan(cfg, cam, sstate, imgs0_chunk, imgs1_chunk)
    sync(sstate)
    scan_fps = n_chunks * CHUNK / (time.perf_counter() - t0)

    # --- sliding-window BA solve time (ms/keyframe) -------------------------
    # Full window: 10 KFs × ~600 live landmarks, the reference's
    # optimize(12)+cull+optimize(8) schedule (vo_localmap.cpp:292-319).
    import jax.random as jr

    from flvis_tpu.backend import window_ba
    from flvis_tpu.config import BackendConfig
    from flvis_tpu.geometry import se3, so3

    bcfg = BackendConfig()
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
    res = window_ba.optimize(bcfg, cam, st)
    sync(res.state)
    n_ba = 10
    t0 = time.perf_counter()
    for _ in range(n_ba):
        res = window_ba.optimize(bcfg, cam, st)
    sync(res.state)
    ba_ms = 1000.0 * (time.perf_counter() - t0) / n_ba

    # --- batched multi-sequence throughput (16 sequences, one chip) ---------
    from flvis_tpu.parallel import multiseq

    S = 16
    cams = jax.tree.map(
        lambda a: jnp.broadcast_to(jnp.asarray(a), (S,) + jnp.shape(jnp.asarray(a))),
        cam)
    # (The single-dispatch track_frame_batch variant measured within 1 % of
    # the vmap×scan mode on every run — dropped to bound bench wall time.)

    # --- vmap × scan: S sequences × T frames in one device program ----------
    # Distinct per-sequence images (a broadcast view would let XLA share HBM
    # reads across the batch and overstate throughput).
    Tn = 8
    i0s = jnp.stack([jnp.stack([jnp.roll(imgs[t % len(imgs)][0], 7 * s, axis=1)
                                for t in range(Tn)]) for s in range(S)])
    i1s = jnp.stack([jnp.stack([jnp.roll(imgs[t % len(imgs)][1], 7 * s, axis=1)
                                for t in range(Tn)]) for s in range(S)])
    vstates = multiseq.init_states(cfg, S)
    # TWO carried warmup calls: the first compiles; the second absorbs the
    # occasional one-time slow dispatch observed on carried-state re-entry
    # (a stray recompile/autotune event that otherwise lands in the timed
    # region and understates steady-state throughput ~15x).
    for _ in range(2):
        vstates, _ = multiseq.track_frames_scan_batch(cfg, cams, vstates, i0s, i1s)
    sync(vstates)
    n_v = 3
    t0 = time.perf_counter()
    for _ in range(n_v):
        vstates, _ = multiseq.track_frames_scan_batch(cfg, cams, vstates, i0s, i1s)
    sync(vstates)
    vmap_scan_fps = n_v * S * Tn / (time.perf_counter() - t0)

    # --- full SYSTEM throughput: frontend + window BA + feedback -------------
    # The end-to-end number: chunked replay through SlamSystem.process_frames
    # with keyframe insertion, the 12+8 Schur BA per keyframe, and the
    # correction feedback applied at chunk boundaries — the whole reference
    # pipeline minus loop closing (whose per-KF cost only matters at loop
    # events).  Orbit step 0.02 m/frame ≈ 0.6 m/s at 30 Hz, giving the
    # reference's 0.05 m keyframe gate every ~3 frames — a keyframe-heavy,
    # conservative cadence.
    from flvis_tpu.config import SystemConfig
    from flvis_tpu.pipeline.runner import SlamSystem

    # Chunk 64: with the fused chunk program the BA feedback is applied
    # per-frame INSIDE the program regardless of chunk length, so a larger
    # chunk only amortizes the single packed fetch (~27 ms tunnel RTT) and
    # host bookkeeping — replay semantics are identical to chunk 16.
    sys_poses = orbit_trajectory(8, step=0.02)
    sys_frames = [scene.render(R, t) for (R, t) in sys_poses]
    CH = 64
    si0 = jnp.stack([jnp.asarray(sys_frames[i % 8][0]) for i in range(CH)])
    si1 = jnp.stack([jnp.asarray(sys_frames[i % 8][1]) for i in range(CH)])
    scfg_sys = SystemConfig(frontend=cfg)
    slam = SlamSystem(scfg_sys, cam)
    for _ in range(2):                       # compile scan + BA + correction
        slam.process_frames(si0, si1)
    sync(slam.fe_state)
    n_s = 3
    t0 = time.perf_counter()
    for _ in range(n_s):
        slam.process_frames(si0, si1)
    sync(slam.fe_state)
    system_fps = n_s * CH / (time.perf_counter() - t0)
    n_kf = len(slam.keyframes)

    # --- full VIO system (EuRoC mode): + IMU propagation & feedback ----------
    # The reference's headline configuration (stereo + IMU).  Same fused
    # chunk program plus per-frame IMU batches (10 samples @ 200 Hz / 20 Hz
    # frames), feedforward priors, RP compensation, and vision→IMU bias
    # feedback — all inside the scan.
    from flvis_tpu.io.synthetic import imu_from_trajectory

    vposes = orbit_trajectory(CH, step=0.02)    # contiguous path, no wraps
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
        # Advance all clocks per replay so IMU time stays monotonic across
        # the carried VioState ring (replaying identical timestamps would
        # feed time running backward into the deque semantics).
        off = rep * (CH / 20.0 + 1.0)
        slam_v.process_frames_vio(
            vi0, vi1, frame_t + off,
            accs, gyros, [t + off for t in imuts])

    for r in range(2):
        run_vio(r)
    sync(slam_v.fe_state)
    n_sv = 3
    t0 = time.perf_counter()
    for r in range(n_sv):
        run_vio(2 + r)
    sync(slam_v.fe_state)
    system_vio_fps = n_sv * CH / (time.perf_counter() - t0)

    baseline = 30.0
    # Headline = the chunked (lax.scan) dataset-replay mode, the apples-to-
    # apples counterpart of the reference's 30 Hz KITTI replay envelope.
    # `stepwise_frames_per_s` is the one-dispatch-per-frame live-camera mode;
    # under the remote-TPU tunnel each dispatch pays a network round trip,
    # so it understates a locally-attached chip.
    result = {
        "metric": "frontend_frames_per_s",
        "value": round(scan_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(scan_fps / baseline, 3),
        "baseline_frames_per_s": baseline,
        "config": "euroc_752x480_256slots_scan16",
        "device": str(dev),
        "ms_per_frame": round(1000.0 / scan_fps, 3),
        "stepwise_frames_per_s": round(fps, 2),
        "window_ba_ms_per_keyframe": round(ba_ms, 3),
        "multiseq16_scan8_frames_per_s": round(vmap_scan_fps, 1),
        "system_frames_per_s": round(system_fps, 2),
        "system_vio_frames_per_s": round(system_vio_fps, 2),
        "system_chunk": CH,
        "system_keyframe_fraction": round(n_kf / (5.0 * CH), 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
