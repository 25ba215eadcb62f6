#!/usr/bin/env python
"""Time the pose-graph optimization at reference-like loop sizes.

The reference runs g2o optimize(100) per accepted loop over the KF window
[first loop id, last loop id] and prints the wall time
(/root/reference/src/backend/vo_loopclosing.cpp:742-944, 492-494).  This
times flvis_tpu.loop.pose_graph.optimize on synthetic drifted circles of
K = 64..512 nodes with sequential +5-successor edges and one loop edge —
the same graph shape loopClosureOnCovGraphG2ONew builds.
"""

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from flvis_tpu.geometry import se3, so3
    from flvis_tpu.loop import pose_graph as pg
    from flvis_tpu.utils.timing import sync

    dev = jax.devices()[0]
    print(f"device={dev}  iters={args.iters}")

    for K in (64, 128, 256, 512):
        # Drifted circle: ground truth on a circle, odometry edges from true
        # relative poses, node estimates accumulated with a small yaw-rate
        # bias (drift), loop edge closing node K-1 to node 0.
        E = 5 * K + 8
        th = np.linspace(0, 2 * np.pi, K, endpoint=False)
        qs, ts = [], []
        for i in range(K):
            q = so3.exp(jnp.asarray([0.0, 0.0, th[i]]))
            t = jnp.asarray([np.cos(th[i]) * 5, np.sin(th[i]) * 5, 0.0],
                            jnp.float32)
            qs.append(q); ts.append(t)
        node_q = jnp.stack(qs); node_t = jnp.stack(ts)
        # Perturb estimates with accumulating drift.
        drift = jnp.cumsum(jnp.full((K,), 0.002)) * jnp.arange(K)
        node_t = node_t + jnp.stack(
            [drift * 0.01, drift * 0.005, jnp.zeros(K)], -1)
        ei, ej, eq, et = [], [], [], []
        for i in range(K):
            for d in range(1, 6):
                j = i + d
                if j >= K:
                    continue
                Ti = se3.SE3(qs[i], ts[i])
                Tj = se3.SE3(qs[j], ts[j])
                Tij = se3.compose(se3.inverse(Ti), Tj)
                ei.append(i); ej.append(j); eq.append(Tij.q); et.append(Tij.t)
        ei.append(K - 1); ej.append(0)
        Tij = se3.compose(se3.inverse(se3.SE3(qs[K - 1], ts[K - 1])),
                          se3.SE3(qs[0], ts[0]))
        eq.append(Tij.q); et.append(Tij.t)
        ne = len(ei)
        g = pg.PoseGraph(
            node_q=node_q, node_t=node_t,
            node_valid=jnp.ones(K, bool),
            edge_i=jnp.zeros(E, jnp.int32).at[:ne].set(jnp.asarray(ei)),
            edge_j=jnp.zeros(E, jnp.int32).at[:ne].set(jnp.asarray(ej)),
            edge_q=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (E, 1)).at[:ne].set(jnp.stack(eq)),
            edge_t=jnp.zeros((E, 3)).at[:ne].set(jnp.stack(et)),
            edge_valid=(jnp.arange(E) < ne),
            edge_weight=jnp.ones(E),
        )
        fixed = jnp.arange(K) == 0
        g2, cost = pg.optimize(g, fixed, iters=args.iters)
        sync(g2.node_t)
        reps = 8
        t0 = time.perf_counter()
        for _ in range(reps):
            g2, cost = pg.optimize(g, fixed, iters=args.iters)
        sync(g2.node_t)
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"K={K:4d} nodes, {ne:5d} edges: {ms:8.2f} ms/solve "
              f"(final cost {float(cost):.4f})", flush=True)


if __name__ == "__main__":
    main()
