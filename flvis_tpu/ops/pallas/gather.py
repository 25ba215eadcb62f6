"""Pallas TPU kernel: batched per-point window gather.

The LK tracker needs one (size, size) image window per tracked point per
pyramid level (ops/lk.py) and one (C, s, s) template block per point.  The
XLA formulation — vmap of lax.dynamic_slice — serializes on the scalar
core (one slice program per point) and was the dominant frontend cost.
Here a single Pallas program walks the point list and issues pipelined
DMAs (8 in flight) with the per-point origins read from scalar-prefetch
SMEM; the gather runs at DMA-engine speed instead of scalar-core speed.

Callers pass an already edge-padded image and clamped integer corners
(top-left), exactly as flvis_tpu.ops.image.extract_windows prepares them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INFLIGHT = 8


def _window_kernel_2d(size: int):
    def kernel(corners_ref, img_ref, out_ref, sems):
        n = out_ref.shape[0]

        def get_dma(i):
            cy = corners_ref[i, 1]
            cx = corners_ref[i, 0]
            return pltpu.make_async_copy(
                img_ref.at[pl.ds(cy, size), pl.ds(cx, size)],
                out_ref.at[i],
                sems.at[jax.lax.rem(i, _INFLIGHT)],
            )

        for i in range(min(_INFLIGHT, n)):
            get_dma(i).start()

        def body(i, carry):
            get_dma(i).wait()

            @pl.when(i + _INFLIGHT < n)
            def _():
                get_dma(i + _INFLIGHT).start()

            return carry

        jax.lax.fori_loop(0, n, body, 0)

    return kernel


def _window_kernel_3d(size: int):
    def kernel(corners_ref, img_ref, out_ref, sems):
        n = out_ref.shape[0]
        c = img_ref.shape[0]

        def get_dma(i):
            cy = corners_ref[i, 1]
            cx = corners_ref[i, 0]
            return pltpu.make_async_copy(
                img_ref.at[pl.ds(0, c), pl.ds(cy, size), pl.ds(cx, size)],
                out_ref.at[i],
                sems.at[jax.lax.rem(i, _INFLIGHT)],
            )

        for i in range(min(_INFLIGHT, n)):
            get_dma(i).start()

        def body(i, carry):
            get_dma(i).wait()

            @pl.when(i + _INFLIGHT < n)
            def _():
                get_dma(i + _INFLIGHT).start()

            return carry

        jax.lax.fori_loop(0, n, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("size", "interpret"))
def gather_windows(img_padded, corners, size: int, interpret: bool | None = None):
    """(H, W) or (C, H, W) image → per-point windows.

    Args:
      img_padded: edge-padded image; 2D → windows (N, size, size), 3D
        (channel-stacked) → (N, C, size, size).
      corners: (N, 2) int32 [x, y] top-left coords in padded-image space,
        pre-clamped to [0, dim - size].
      size: window side length (static).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = corners.shape[0]
    if img_padded.ndim == 2:
        kern = _window_kernel_2d(size)
        out_shape = jax.ShapeDtypeStruct((n, size, size), img_padded.dtype)
    else:
        c = img_padded.shape[0]
        kern = _window_kernel_3d(size)
        out_shape = jax.ShapeDtypeStruct((n, c, size, size), img_padded.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_INFLIGHT,))],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(corners.astype(jnp.int32), img_padded)
