"""Pallas TPU kernel: fused plane-sweep disparity (diff + box + argmin +
subpixel in VMEM).

The XLA formulation of ops/stereo.disparity_sweep materializes the
(D, H/2, W/2) cost volume in HBM three times over (diff volume, box-x
intermediate, boxed volume) and pays a relayout per lane-shifted candidate;
measured floor ~1.45 ms/keyframe with the diff volume alone at 1.13
(tools/profile_sweep_variants.py — the MXU one-hot shift matmul ties it, so
the cost is volume materialization, not the shifts).  This kernel keeps the
whole per-row-tile volume in VMEM scratch: HBM traffic collapses to the two
half-res images in and two (H/2, W/2) maps out, and the box runs as the
4-add/axis factored 9-tap (3-tap ∘ 3-tap dilated by 3, exact).

Semantics match stereo.disparity_sweep (same SAD, same 3-point parabolic
subpixel, same ambiguity margin) except within `radius` columns of the
left/right image edge, where the XLA path edge-replicates the box support
and this kernel marks the output invalid instead — the ORB detector's
20-full-res-pixel margin keeps keypoints ~10 half-res px from the border,
so no sampled keypoint sees the difference.

Mosaic notes (see CLAUDE.md): everything stays ≥2D; the candidate loop is
STATICALLY unrolled so all lane slices have static offsets (dynamic lane
offsets are rejected); scratch reads in the reduction passes index only the
leading (non-tiled) dimension dynamically.  bf16=True fails Mosaic
("Invalid relayout ... vector<24x368xi1>" on the pass-3 masks) — keep the
f32 default; the kernel is already ~2.6× the XLA path at f32 (0.56 vs 1.47
ms/KF at 8-wide EuRoC half-res).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TH = 24          # output rows per grid step (240-row EuRoC half-res → 10)


def _tap3(v, axis, d):
    """3-tap sum with dilation d along axis (valid region only)."""

    def sub(lo):
        s = [slice(None)] * v.ndim
        hi = lo - 2 * d
        s[axis] = slice(lo, hi if hi != 0 else None)
        return v[tuple(s)]

    return sub(0) + sub(d) + sub(2 * d)


def _box9(v, axis):
    """Exact 9-tap box along axis, valid region (width shrinks by 8)."""
    return _tap3(_tap3(v, axis, 1), axis, 3)


def _make_kernel(d_max: int, th: int, w2: int, dtype):
    def kernel(l_ref, r_ref, disp_ref, cb_ref, val_ref, vol):
        t = pl.program_id(0)
        lt = l_ref[pl.ds(t * th, th + 8), :].astype(dtype)   # (th+8, Wh)
        rt = r_ref[pl.ds(t * th, th + 8), :].astype(dtype)   # (th+8, Wh+D)

        # Pass 1: per-candidate SAD + factored 9x9 box, volume in VMEM.
        for d in range(d_max):
            rd = rt[:, d_max - d: d_max - d + lt.shape[1]]
            diff = jnp.abs(lt - rd)                   # (th+8, Wh)
            cx = _box9(diff, 1)                       # (th+8, W2)
            vol[d] = _box9(cx, 0)                     # (th, W2)

        # Pass 2: min / argmin over candidates.
        c_best = vol[0]
        best = jnp.zeros((th, w2), jnp.int32)
        for d in range(1, d_max):
            c = vol[d]
            upd = c < c_best
            c_best = jnp.where(upd, c, c_best)
            best = jnp.where(upd, d, best)

        # Pass 3: neighbours of the winner + ambiguity margin.
        big = jnp.asarray(3.0e38 if dtype == jnp.float32 else 3.0e38,
                          jnp.float32)
        cbf = c_best.astype(jnp.float32)
        cm = jnp.zeros((th, w2), jnp.float32)
        cp = jnp.zeros((th, w2), jnp.float32)
        c2 = jnp.full((th, w2), big)
        for d in range(d_max):
            c = vol[d].astype(jnp.float32)
            cm = jnp.where(best == d + 1, c, cm)
            cp = jnp.where(best == d - 1, c, cp)
            far = jnp.abs(best - d) > 2
            c2 = jnp.where(far & (c < c2), c, c2)

        denom = cm + cp - 2.0 * cbf
        delta = jnp.where(denom > 1e-3,
                          0.5 * (cm - cp) / jnp.maximum(denom, 1e-3), 0.0)
        delta = jnp.clip(delta, -0.5, 0.5)
        disp_ref[:] = best.astype(jnp.float32) + delta
        cb_ref[:] = cbf
        ok = ((c2 > 1.05 * cbf + 1e-3)
              & (best > 0) & (best < d_max - 1))
        val_ref[:] = ok.astype(jnp.float32)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("d_max", "radius", "interpret", "th",
                                    "bf16"))
def sweep_maps_pallas(L, R, d_max: int = 64, radius: int = 4,
                      interpret: bool | None = None, th: int | None = None,
                      bf16: bool = False):
    """Half-res inputs (Hh, Wh) → (disp_h, c_best, ok) maps, each (Hh, Wh).

    disp_h is in HALF-RES pixels (the caller scales by 2); `ok` excludes the
    ambiguity-margin failures and the radius-wide border band.  Only
    radius=4 is supported (the factored box); Hh is padded to a multiple of
    the row tile internally.
    """
    assert radius == 4, "factored box kernel is radius-4 only"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Hh, Wh = L.shape
    w2 = Wh - 8
    if th is None:
        th = _TH
    pad_h = (-Hh) % th
    # +4-row halo top/bottom (edge) for the box-y support, plus tile padding.
    Lp = jnp.pad(L, ((4, 4 + pad_h), (0, 0)), mode="edge")
    Rp = jnp.pad(R, ((4, 4 + pad_h), (d_max, 0)), mode="edge")
    Hp = Hh + pad_h
    n_t = Hp // th
    dtype = jnp.bfloat16 if bf16 else jnp.float32

    kernel = _make_kernel(d_max, th, w2, dtype)
    disp, cb, ok = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(n_t,),
        in_specs=[
            pl.BlockSpec((Hp + 8, Wh), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Hp + 8, Wh + d_max), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((th, w2), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, w2), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, w2), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Hp, w2), jnp.float32),
            jax.ShapeDtypeStruct((Hp, w2), jnp.float32),
            jax.ShapeDtypeStruct((Hp, w2), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((d_max, th, w2), dtype)],
    )(Lp, Rp)

    # Back to (Hh, Wh): border band invalid, disparity 0 there.
    z = jnp.zeros((Hh, 4), jnp.float32)
    emb = lambda a: jnp.concatenate([z, a[:Hh], z], axis=1)
    return emb(disp), emb(cb), emb(ok) > 0.5
