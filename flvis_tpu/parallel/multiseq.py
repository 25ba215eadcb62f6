"""Multi-sequence data parallelism: shard independent SLAM runs over devices.

The reference processes one rosbag per process (SURVEY.md §2.3); the
TPU-native scaling story starts with the embarrassingly-parallel axis —
"all 11 EuRoC runs sharded across hosts/chips" (BASELINE.json north star).
A batch of independent TrackerStates is laid out with a leading `seq` axis
sharded over the device mesh; the per-frame step is the vmapped tracker,
jitted with NamedSharding constraints so XLA keeps every sequence resident
on its own device with zero cross-device traffic in steady state.

This module is deliberately thin: the tracker itself is already pure and
fixed-shape, so data parallelism is vmap + sharding annotations — no
NCCL-style replication machinery to port.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import FrontendConfig
from ..frontend import tracker
from ..geometry.camera import StereoCamera


def make_mesh(n_devices: int | None = None, axis: str = "seq") -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    # Auto axis type: classic GSPMD sharding propagation.  The default
    # Explicit type threads shardings through abstract values, which breaks
    # vmap-of-lax.cond (the tracker's state-machine dispatch).
    return jax.make_mesh(
        (len(devs),), (axis,), devices=devs,
        axis_types=(jax.sharding.AxisType.Auto,),
    )


def init_states(cfg: FrontendConfig, num_seqs: int, mesh: Mesh | None = None):
    """A batch of fresh tracker states with leading `seq` axis, sharded."""
    one = tracker.init_state(cfg)
    batch = jax.tree.map(lambda a: jnp.broadcast_to(a, (num_seqs,) + a.shape).copy(), one)
    if mesh is not None:
        batch = jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P(*(("seq",) + (None,) * (a.ndim - 1))))),
            batch,
        )
    return batch


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_frame_batch(cfg: FrontendConfig, cams: StereoCamera, states, imgs0, imgs1, keys):
    """One tracking step for S independent sequences.

    Args:
      cams: StereoCamera pytree with leading (S,) axis (per-sequence intrinsics).
      states: TrackerState pytree with leading (S,) axis.
      imgs0/imgs1: (S, H, W) stereo frames.
      keys: (S, 2) PRNG keys.
    Under a mesh, the leading axis is sharded over `seq`, so each device
    advances its own sequences; there are no collectives in this program.
    """
    step = lambda cam, st, i0, i1, k: tracker.track_frame(
        cfg, cam, st, i0, i1, rng_key=k
    )
    return jax.vmap(step)(cams, states, imgs0, imgs1, keys)


def shard_batch(mesh: Mesh, tree):
    """Place a leading-axis batch pytree on the mesh's seq axis."""
    return jax.tree.map(
        lambda a: jax.device_put(
            a, NamedSharding(mesh, P(*(("seq",) + (None,) * (a.ndim - 1))))
        ),
        tree,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_frames_scan_batch(cfg: FrontendConfig, cams: StereoCamera,
                            states, imgs0, imgs1):
    """Chunked replay for S independent sequences: lax.scan over T frames of
    the vmapped per-frame step — ONE device program for S·T tracking steps.

    The full-throughput configuration (the "all EuRoC runs at once" mode):
    no per-frame dispatch, no per-sequence dispatch, no collectives.
    Structured as scan-of-vmap, NOT vmap-of-scan: vmapping a scanned tracker
    batches the loop carry through gather/scatter lowerings that run ~1000×
    slower on TPU, while scanning the (already fast) vmapped step keeps each
    iteration identical to track_frame_batch.

    Args:
      imgs0/imgs1: (S, T, H, W) stacked frames per sequence.
    Returns: (states, FrameOutput with leading (S, T) axes).
    """
    xs = (jnp.swapaxes(imgs0, 0, 1), jnp.swapaxes(imgs1, 0, 1))  # (T, S, H, W)

    def step(sts, x):
        i0, i1 = x
        vstep = jax.vmap(
            lambda cam, st, a, b: tracker.track_frame(cfg, cam, st, a, b))
        return vstep(cams, sts, i0, i1)

    states, outs = jax.lax.scan(step, states, xs)
    # (T, S, ...) → (S, T, ...)
    outs = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), outs)
    return states, outs
