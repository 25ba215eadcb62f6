"""Pallas TPU kernel: fused Scharr gradients + 5-tap pyrDown blur.

One pyramid level of ops/image.build_grad_pyramid costs three separable
filters over the same source (Scharr gx, Scharr gy, the 5-tap binomial blur
that feeds pyr_down) — in XLA that is ~30 shifted-add passes per level whose
cost is op-dispatch/pass count, not FLOPs (the whole-stack grad pyramid
measured 1.26 ms/frame at (3, 480, 752), ~100x the speed-of-light HBM time).
This kernel reads each image into VMEM once and emits all three maps from
that one resident copy, exactly like ops/pallas/fastblur.py does for
FAST+blur.

Filter semantics match ops/image._sep_filter (same tap order, same weights,
edge-replicate padding applied by the caller): pre-padding the source by the
combined halo is exactly equivalent to _sep_filter's
pad-x/filter-x/pad-y/filter-y because replicated rows are x-filtered into
replicated rows.  On TPU the match is bit-exact (verified on hardware);
interpret mode on CPU shows ~1e-5 FMA-contraction jitter vs the fused XLA
graph.

Grid: (batch, row-tile).  The input block is the WHOLE padded image of one
batch element (index map ignores the tile index, so Mosaic keeps it VMEM
resident across the row tiles); outputs are (1, th, W) row tiles.

Replaces the separable-filter formulation of cv::buildOpticalFlowPyramid +
cv::Scharr (OpenCV's LK derivative), see /root/reference/src/processing/
lkorb_tracking.cpp:64-72 for the LK consumer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TH = 48                      # output rows per grid step

# Same constants as ops/image (_PYR_K, scharr_gradients).
_PYR_K = [float(v) for v in np.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0]
_SMOOTH = [float(v) for v in np.asarray([3.0, 10.0, 3.0]) / 32.0]


def _make_kernel(th: int, w: int):
    def kernel(img_ref, gx_ref, gy_ref, blur_ref):
        t = pl.program_id(1)
        # Output rows [t*th, t*th+th) need input rows [t*th, t*th+th+4) of
        # the 2-edge-padded image (halo 2 = 5-tap blur; Scharr needs 1).
        tile = img_ref[0, pl.ds(t * th, th + 4), :]    # (th+4, W+4) f32

        # ---- Scharr gx: x-diff then y-smooth ---------------------------
        # Center column of output col c is padded col c+2.
        dx = tile[:, 3:3 + w] - tile[:, 1:1 + w]       # (th+4, W)
        gx = (dx[1:1 + th, :] * _SMOOTH[0]
              + dx[2:2 + th, :] * _SMOOTH[1]
              + dx[3:3 + th, :] * _SMOOTH[2])
        gx_ref[0, :, :] = gx

        # ---- Scharr gy: x-smooth then y-diff ---------------------------
        sm = (tile[:, 1:1 + w] * _SMOOTH[0]
              + tile[:, 2:2 + w] * _SMOOTH[1]
              + tile[:, 3:3 + w] * _SMOOTH[2])         # (th+4, W)
        gy_ref[0, :, :] = sm[3:3 + th, :] - sm[1:1 + th, :]

        # ---- 5-tap binomial blur (pyr_down's low-pass) -----------------
        bx = None
        for i, wgt in enumerate(_PYR_K):
            term = tile[:, i:i + w] * wgt              # (th+4, W)
            bx = term if bx is None else bx + term
        by = None
        for j, wgt in enumerate(_PYR_K):
            term = bx[j:j + th, :] * wgt               # (th, W)
            by = term if by is None else by + term
        blur_ref[0, :, :] = by

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "th"))
def grad_blur_pallas(stack, interpret: bool | None = None,
                     th: int | None = None):
    """(B, H, W) f32 -> (gx, gy, blur5), each (B, H, W).

    gx/gy bit-match ops/image.scharr_gradients; blur5 bit-matches
    _sep_filter(stack, _PYR_K, _PYR_K) (pyr_down before its decimation).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, W = stack.shape
    if th is None:
        th = min(_TH, H)
    pad_h = (-H) % th
    Hp = H + pad_h
    # 2-px edge-replicate halo on all sides (+ tile padding at the bottom).
    stackp = jnp.pad(stack, ((0, 0), (2, 2 + pad_h), (2, 2)), mode="edge")
    n_t = Hp // th

    kernel = _make_kernel(th, W)
    out_spec = pl.BlockSpec((1, th, W), lambda b, t: (b, t, 0),
                            memory_space=pltpu.VMEM)
    gx, gy, blur = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(B, n_t),
        in_specs=[pl.BlockSpec((1, Hp + 4, W + 4), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((B, Hp, W), jnp.float32)] * 3,
    )(stackp)
    return gx[:, :H], gy[:, :H], blur[:, :H]
