"""Pallas TPU kernel: fused FAST-9 response + 3x3 NMS + 7-tap Gaussian blur.

The XLA formulation of ops/orb.fast_score materializes 16 rolled copies of
the full image, a (16, H, W) diff stack and its masks — ~28 full-image HBM
passes, measured 0.83 ms/keyframe at 752x480, with gaussian_blur (14
shifted-add passes for the separable 7-tap) another 0.40
(tools/profile_ingest_stages.py).  Both stages read the SAME source image,
so this kernel computes them together from one VMEM-resident copy: HBM
traffic collapses to one image in and two maps out.  The 3x3 non-max
suppression + detection-margin mask that ops/orb.detect_and_compute applied
afterwards (a reduce_window pass + a where pass) are folded in too: the
kernel computes the raw response on a 1-px-extended region and emits the
suppressed, margin-masked score directly.

Per row tile (the whole padded image sits in VMEM; tiles are pl.ds row
slices of it, as in ops/pallas/sweep.py):
  - FAST-9: the 16 Bresenham circle samples are STATIC row/lane slices of
    the padded tile (no rolls); the "9 contiguous on the circle" test runs
    as a run-length accumulator over the DOUBLED 32-step traversal
    (run <- (run+1)*mask; corner |= run>=9) so only ~4 arrays stay live
    instead of 16 materialized masks.  Masks are kept as f32 0/1 —
    multiply=AND, max=OR (Mosaic rejects some i1 relayouts; CLAUDE.md).
  - NMS: raw score on (th+2, W+2), 3x3 max via static shifts, keep ties
    (score >= pooled), zero outside the margin box (iota is built INTEGER
    then cast — Mosaic rejects f32 iota; CLAUDE.md).
  - Blur: separable 7-tap as x-pass then y-pass shifted adds inside the
    tile, identical weights/edge-padding to ops/image.gaussian_blur
    (sigma=2, ksize=7; the caller pre-pads edge-replicate).

Border semantics: fast_score's jnp.roll wraps at the image border while
this kernel sees edge-replicated padding — the two differ only within 3 px
of the border, and the margin mask (>= 4 px in practice, 20 px in the ORB
path) zeroes every pixel where they could disagree, so the suppressed
output matches the XLA formulation exactly.  The blur is bit-matched
everywhere (same edge padding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..orb import _CIRCLE

_TH = 48                      # output rows per grid step


def _gauss7(sigma: float = 2.0):
    xs = np.arange(-3, 4, dtype=np.float32)
    k = np.exp(-0.5 * (xs / float(sigma)) ** 2)
    return [float(v) for v in (k / np.sum(k))]


def _make_kernel(th: int, w: int, threshold: float, sigma: float,
                 margin: int, h: int):
    kv = _gauss7(sigma)

    def kernel(img_ref, score_ref, blur_ref):
        t = pl.program_id(0)
        # The image is padded with a 4-px halo.  Output rows
        # [t*th, t*th+th) need input rows [t*th, t*th+th+8) of the padded
        # image (score on the 1-px-extended region reads +-3 around it).
        tile = img_ref[pl.ds(t * th, th + 8), :]       # (th+8, W+8) f32

        # ---- Gaussian blur: x-pass then y-pass shifted adds ------------
        # Center of output col c is padded col c+4; 7-tap span c+1..c+7.
        bx = None
        for i, wgt in enumerate(kv):
            term = tile[:, 1 + i:1 + i + w] * wgt      # (th+8, W)
            bx = term if bx is None else bx + term
        by = None
        for j, wgt in enumerate(kv):
            term = bx[1 + j:1 + j + th, :] * wgt       # (th, W)
            by = term if by is None else by + term
        blur_ref[:] = by

        # ---- FAST-9 response on the 1-px-extended region ---------------
        # Extended pixel (r, c), r in [-1, th], c in [-1, W]: center at
        # padded (r+4, c+4); circle offsets +-3 stay in range.
        we = w + 2
        center = tile[3:3 + th + 2, 3:3 + we]          # (th+2, W+2)

        def diff(k):
            dx, dy = int(_CIRCLE[k][0]), int(_CIRCLE[k][1])
            return tile[3 + dy:3 + dy + th + 2, 3 + dx:3 + dx + we] - center

        zero = jnp.zeros((th + 2, we), jnp.float32)
        score = zero
        for k in range(16):
            d = diff(k)
            ad = jnp.abs(d)
            score = score + jnp.where(ad > threshold, ad - threshold, 0.0)

        def arc9(sign):
            # Doubled 32-step run-length traversal of the circular masks:
            # any circular run of >=9 consecutive over-threshold samples
            # shows up as a linear run of >=9 in the doubled sequence.
            run = zero
            corner = zero
            for k in range(32):
                d = diff(k % 16)
                m = jnp.where(sign * d > threshold, 1.0, 0.0)
                run = (run + 1.0) * m
                corner = jnp.maximum(corner,
                                     jnp.where(run >= 9.0, 1.0, 0.0))
            return corner

        score = score * jnp.maximum(arc9(1.0), arc9(-1.0))  # (th+2, W+2)

        # ---- 3x3 NMS (keep ties) + margin mask -------------------------
        pooled = None
        for dy in range(3):
            for dx in range(3):
                win = score[dy:dy + th, dx:dx + w]
                pooled = win if pooled is None else jnp.maximum(pooled, win)
        cen = score[1:1 + th, 1:1 + w]
        yy = (jax.lax.broadcasted_iota(jnp.int32, (th, w), 0)
              + t * th).astype(jnp.float32)
        xx = jax.lax.broadcasted_iota(jnp.int32, (th, w), 1).astype(jnp.float32)
        ok = (jnp.where(yy >= margin, 1.0, 0.0)
              * jnp.where(yy < h - margin, 1.0, 0.0)
              * jnp.where(xx >= margin, 1.0, 0.0)
              * jnp.where(xx < w - margin, 1.0, 0.0))
        keep = jnp.where(cen >= pooled, 1.0, 0.0) * ok
        score_ref[:] = cen * keep

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("threshold", "sigma", "margin",
                                    "interpret", "th"))
def fast_score_nms_blur_pallas(img, threshold: float = 20.0,
                               sigma: float = 2.0, margin: int = 20,
                               interpret: bool | None = None,
                               th: int | None = None):
    """(H, W) f32 image -> (suppressed fast9 score, 7-tap Gaussian blur).

    The score output equals ops/orb.fast_score -> 3x3 reduce_window max ->
    keep-ties + margin mask (margin must be >= 4 so the border band where
    the roll-wrap/edge-pad formulations differ is masked; see module note).
    The blur matches ops/image.gaussian_blur(sigma, ksize=7) exactly.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert margin >= 4, "margin must cover the 4-px border band"
    H, W = img.shape
    if th is None:
        th = _TH
    pad_h = (-H) % th
    Hp = H + pad_h
    # 4-px edge-replicate halo on all sides (+ tile padding at the bottom).
    imgp = jnp.pad(img, ((4, 4 + pad_h), (4, 4)), mode="edge")
    n_t = Hp // th

    kernel = _make_kernel(th, W, float(threshold), float(sigma),
                          int(margin), H)
    score, blur = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(n_t,),
        in_specs=[pl.BlockSpec((Hp + 8, W + 8), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((th, W), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, W), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Hp, W), jnp.float32),
            jax.ShapeDtypeStruct((Hp, W), jnp.float32),
        ],
    )(imgp)
    return score[:H], blur[:H]


