#!/usr/bin/env python
"""Run MANY SLAM sequences data-parallel on one chip / mesh.

The "all EuRoC runs sharded across chips" configuration from the north star:
S independent tracker states advance in lock-step as one vmapped device
program, with the sequence axis sharded over whatever mesh is available.
Per-sequence trajectories and ATE are reported at the end.

Uses synthetic scenes (distinct seeds per sequence) so it runs anywhere;
swap the frame source for EurocDataset iterators to run real data.

Usage:
  python examples/run_multiseq.py [--sequences 8] [--frames 30] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sequences", type=int, default=8)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax.numpy as jnp
    import numpy as np

    from flvis_tpu.config import FrontendConfig
    from flvis_tpu.geometry import camera, so3
    from flvis_tpu.io.synthetic import PlanarScene, SceneConfig, orbit_trajectory
    from flvis_tpu.parallel import multiseq
    from flvis_tpu.utils import evaluation

    S = args.sequences
    n_dev = len(jax.devices())
    mesh = multiseq.make_mesh(min(S, n_dev)) if n_dev > 1 and S % min(S, n_dev) == 0 else None
    print(f"devices: {n_dev}, sequences: {S}, mesh: {mesh}")

    scfg = SceneConfig()
    cfg = FrontendConfig(width=scfg.width, height=scfg.height, num_slots=128,
                         pyramid_levels=3, per_cell=8, min_distance=12.0, margin=22)
    cam1 = camera.make(scfg.fx, scfg.fy, scfg.cx, scfg.cy, scfg.baseline,
                       width=scfg.width, height=scfg.height)
    cams = jax.tree.map(
        lambda a: jnp.broadcast_to(jnp.asarray(a), (S,) + jnp.shape(jnp.asarray(a))), cam1)

    print("rendering sequences on host...")
    scenes = [PlanarScene(scfg, plane_depth=8.0, seed=100 + s) for s in range(S)]
    poses = orbit_trajectory(args.frames, step=0.03)
    frames = [
        np.stack([np.stack(scenes[s].render(R, t)[:2]) for s in range(S)])
        for (R, t) in poses
    ]  # per frame: (S, 2, H, W)

    states = multiseq.init_states(cfg, S, mesh)
    if mesh is not None:
        cams = multiseq.shard_batch(mesh, cams)
    keys = jax.random.split(jax.random.PRNGKey(0), S)

    t_start = None
    outs_log = []
    for i, f in enumerate(frames):
        i0 = jnp.asarray(f[:, 0])
        i1 = jnp.asarray(f[:, 1])
        if mesh is not None:
            i0 = multiseq.shard_batch(mesh, i0)
            i1 = multiseq.shard_batch(mesh, i1)
        states, outs = multiseq.track_frame_batch(cfg, cams, states, i0, i1, keys)
        if i == 0:
            jax.block_until_ready(states)
            t_start = time.perf_counter()
        outs_log.append(jax.tree.map(np.asarray, outs))
    jax.block_until_ready(states)
    elapsed = time.perf_counter() - t_start
    agg = S * (len(frames) - 1) / elapsed
    print(f"throughput: {agg:.1f} frames/s aggregate over {S} sequences "
          f"({elapsed / (len(frames) - 1) * 1e3:.1f} ms/batched step)")

    # Per-sequence final ATE vs ground truth.
    ok = True
    C_gt = np.asarray([-R.T @ t for (R, t) in poses])
    for s in range(S):
        C_est = []
        for i in range(len(poses)):
            q = outs_log[i].T_c_w.q[s]
            tt = outs_log[i].T_c_w.t[s]
            R_e = np.asarray(so3.to_matrix(jnp.asarray(q)))
            C_est.append(-R_e.T @ tt)
        ate, _ = evaluation.ate_rmse(np.asarray(C_est), C_gt, align=False)
        status = int(outs_log[-1].status[s])
        print(f"  seq {s}: ATE {ate * 100:6.2f} cm  status={status}")
        ok &= ate < 0.05 and status == 1
    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
