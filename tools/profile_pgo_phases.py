#!/usr/bin/env python
"""Per-phase timing of the banded PGO solver at 2048 nodes on the real TPU:
edge Jacobians, block-tridiagonal assembly (scatter-adds), the Thomas
multi-RHS solve, and the full LM iteration — to attribute the
pgo2048_banded_ms cost before optimizing blindly (round-3 finding:
_SUPER 8→16 changed nothing, so the scan was presumed innocent)."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from flvis_tpu.geometry import se3, so3
    from flvis_tpu.loop import pose_graph as pg
    from flvis_tpu.utils.timing import sync

    K, succ, Lp = 2048, 5, 16
    s = pg._SUPER
    G, S = K // s, 6 * s
    E = succ * K + Lp
    rng = np.random.default_rng(0)

    # Realistic banded graph (same construction as bench.py).
    th = np.linspace(0, 2 * np.pi, 2000)
    pos = np.zeros((K, 3), np.float32)
    pos[:2000] = (np.stack([np.cos(th), np.sin(th), 0 * th], -1) * 20)
    qs = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (K, 1))
    gt = se3.SE3(jnp.asarray(qs), jnp.asarray(pos))
    a_idx = np.arange(K)
    ei, ej, eq, et, ev, ew = [], [], [], [], [], []
    for s_ in range(1, succ + 1):
        b_idx = np.minimum(a_idx + s_, K - 1)
        rel = se3.compose(se3.inverse(se3.index(gt, jnp.asarray(a_idx))),
                          se3.index(gt, jnp.asarray(b_idx)))
        ei.append(a_idx); ej.append(b_idx)
        eq.append(np.asarray(rel.q)); et.append(np.asarray(rel.t))
        ev.append(a_idx + s_ < 2000); ew.append(np.full(K, 1.0, np.float32))
    ei.append(np.zeros(Lp, np.int64)); ej.append(np.full(Lp, 1990))
    eq.append(np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (Lp, 1)))
    et.append(np.zeros((Lp, 3), np.float32))
    ev.append(np.zeros(Lp, bool)); ew.append(np.full(Lp, 5.0, np.float32))
    g = pg.PoseGraph(
        node_q=jnp.asarray(qs),
        node_t=jnp.asarray(pos + rng.normal(0, 0.1, (K, 3)).astype(np.float32)),
        node_valid=jnp.asarray(a_idx < 2000),
        edge_i=jnp.asarray(np.concatenate(ei), jnp.int32),
        edge_j=jnp.asarray(np.concatenate(ej), jnp.int32),
        edge_q=jnp.asarray(np.concatenate(eq)),
        edge_t=jnp.asarray(np.concatenate(et)),
        edge_valid=jnp.asarray(np.concatenate(ev)),
        edge_weight=jnp.asarray(np.concatenate(ew)))
    fixed = jnp.zeros(K, bool).at[0].set(True)

    def timed(label, fn, reps=5):
        r = fn(); sync(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        sync(r)
        print(f"{label:46s} {(time.perf_counter() - t0) / reps * 1000:8.1f} ms",
              flush=True)

    # Full solves at different iteration caps → per-iteration slope AND
    # convergence (does the solution change past iteration ~5?).
    for it in (1, 3, 5, 8, 15):
        f = lambda it=it: pg.optimize_banded(g, fixed, band_edges=succ * K,
                                             iters=it)[0].node_t
        timed(f"optimize_banded iters={it}", f, reps=3)
        g2, c = pg.optimize_banded(g, fixed, band_edges=succ * K, iters=it)
        err = np.linalg.norm(np.asarray(g2.node_t[:2000]) - pos[:2000],
                             axis=-1)
        print(f"   iters={it:3d} cost={float(c):10.4f} "
              f"mean_err={err.mean():.4f} max_err={err.max():.4f}",
              flush=True)

    # Edge Jacobians alone.
    Tij = se3.SE3(g.edge_q, g.edge_t)

    @jax.jit
    def jacs():
        Ti = se3.index(se3.SE3(g.node_q, g.node_t), g.edge_i)
        Tj = se3.index(se3.SE3(g.node_q, g.node_t), g.edge_j)
        r, Ji, Jj = jax.vmap(pg._edge_res_jac)(Ti, Tj, Tij)
        return Ji

    timed(f"edge jacobians E={E}", jacs)

    # Scatter-add assembly alone (the D/U block build).
    Eb = succ * K
    Hii = jnp.asarray(rng.normal(0, 1, (Eb, 6, 6)).astype(np.float32))
    gi, oi = g.edge_i[:Eb] // s, (g.edge_i[:Eb] % s) * 6
    gj, oj = g.edge_j[:Eb] // s, (g.edge_j[:Eb] % s) * 6
    r6 = jnp.arange(6)

    @jax.jit
    def assemble(H):
        D = jnp.zeros((G, S, S))
        rows_i = oi[:, None, None] + r6[None, :, None]
        cols_i = oi[:, None, None] + r6[None, None, :]
        rows_j = oj[:, None, None] + r6[None, :, None]
        cols_j = oj[:, None, None] + r6[None, None, :]
        D = D.at[gi[:, None, None], rows_i, cols_i].add(H)
        D = D.at[gj[:, None, None], rows_j, cols_j].add(H)
        D = D.at[gi[:, None, None], rows_i, cols_j].add(H)
        D = D.at[gi[:, None, None], rows_j, cols_i].add(H)
        return D

    timed(f"4 block scatter-adds E={Eb}", lambda: assemble(Hii))

    # Thomas multi-RHS solve alone.
    Dm = jnp.tile((10.0 * jnp.eye(S))[None], (G, 1, 1)) + \
        jnp.asarray(rng.normal(0, 0.1, (G, S, S)).astype(np.float32))
    U = jnp.asarray(rng.normal(0, 0.1, (G, S, S)).astype(np.float32))
    N = 1 + Lp * 6
    X = jnp.asarray(rng.normal(0, 1, (G, S, N)).astype(np.float32))
    th_solve = jax.jit(pg._thomas_solve)
    timed(f"thomas solve G={G} S={S} N={N}", lambda: th_solve(Dm, U, X))


if __name__ == "__main__":
    main()
