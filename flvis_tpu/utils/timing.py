"""Honest device synchronization for benchmarking.

On the remote-TPU (axon) backend `jax.block_until_ready` can return before
the computation has actually finished — timings taken with it measure only
dispatch, inflating throughput by orders of magnitude (discovered when a
"0.019 ms/frame" frontend exceeded the chip's HBM bandwidth by ~10x; the
fetch-verified time was 385 ms/frame).  The only reliable barrier is to
FETCH a value that data-depends on the computation to the host.

Use `sync(tree)` after the timed region: one jitted program folds the first
element of every array leaf into a single f32 scalar, and that scalar is
fetched to the host — one tiny transfer that forces completion of every
leaf's producing computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _fold_first(leaves):
    acc = jnp.float32(0.0)
    for leaf in leaves:
        first = jax.lax.reshape(leaf, (leaf.size,))[0]
        acc = acc + jax.lax.convert_element_type(first, jnp.float32)
    return acc


def sync(tree) -> float:
    """Block until every array leaf of `tree` is actually computed.

    Returns the folded scalar (value is meaningless; the fetch is the point).
    """
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "shape") and getattr(l, "size", 0)]
    if not leaves:
        return 0.0
    return float(np.asarray(_fold_first(leaves)))
