"""Checkpoint/resume for SLAM state.

The reference has NO state checkpointing — only debug dumps of the
similarity matrix and g2o graphs to hard-coded home paths
(/root/reference/src/backend/vo_loopclosing.cpp:439-452,879,887).  The TPU
build treats map/trajectory persistence as a first-class capability: any
jax pytree (TrackerState, WindowState, VioState, ...) round-trips through a
single .npz via its flattened key paths, with structure checked against a
template on load.  No pickle — files are plain arrays.
"""

from __future__ import annotations

import numpy as np

import jax


def _key(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "key"):
            parts.append(str(p.key))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_pytree(path: str, tree) -> None:
    """Write a pytree of arrays to `path` (.npz)."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {}
    for p, leaf in flat:
        arrays[_key(p)] = np.asarray(leaf)
    np.savez_compressed(path, **arrays)


def load_pytree(path: str, template):
    """Load a pytree saved by save_pytree, using `template` for structure
    (shapes/dtypes are validated; static dataclass fields come from the
    template)."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, leaf in flat:
        k = _key(p)
        if k not in data:
            raise KeyError(f"checkpoint missing leaf {k!r}")
        arr = data[k]
        want = np.asarray(leaf)
        if arr.shape != want.shape:
            raise ValueError(f"leaf {k!r}: shape {arr.shape} != template {want.shape}")
        leaves.append(jax.numpy.asarray(arr.astype(want.dtype)))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves
    )


def save_slam_system(path: str, slam) -> None:
    """Checkpoint a pipeline.runner.SlamSystem (frontend + backend + VIO
    state and the trajectory log)."""
    state = {
        "fe": slam.fe_state,
        "ba": slam.ba_state,
        "vio": slam.vio_state,
    }
    save_pytree(path, state)
    traj = np.asarray(
        [[fid, t, *np.asarray(q), *np.asarray(tt)] for (fid, t, q, tt) in slam.trajectory],
        np.float64,
    ).reshape(-1, 9)
    np.save(path + ".traj.npy", traj)


def load_slam_system(path: str, slam) -> None:
    """Restore a SlamSystem checkpoint in place (slam provides templates)."""
    state = load_pytree(path, {
        "fe": slam.fe_state, "ba": slam.ba_state, "vio": slam.vio_state,
    })
    slam.fe_state = state["fe"]
    slam.ba_state = state["ba"]
    slam.vio_state = state["vio"]
    traj = np.load(path + ".traj.npy")
    slam.trajectory = [
        (int(r[0]), float(r[1]), r[2:6].astype(np.float32), r[6:9].astype(np.float32))
        for r in traj
    ]
