"""Pallas TPU kernel: fused BoW word assignment + term-frequency histogram.

bow.transform's XLA formulation unpacks the packed descriptors to a
(N, 256) ±1 matrix in HBM, runs the (N, V) similarity matmul, argmaxes,
then SCATTER-ADDS the 1-hot term frequencies — four HBM-materialized
intermediates and a serializing scatter, ~0.44 ms/keyframe at N=1000,
V=4096 inside the fused ingest (tools/profile_ingest_stages.py).

This kernel keeps everything in VMEM: unpack the (N, 8) uint32 block with
the broadcast-compare idiom (ops/pallas/hamming.py), tile the vocabulary
into lane-sized word blocks on the MXU, carry a running (max, argmax) pair
across tiles, then build the (V,) term-frequency vector with a second
tiled pass of broadcast-compares (compare + reduce — the TPU-fast
histogram; scatter-add into 4096 bins serializes).

Matches bow.transform's tf output exactly: the ±1 dot products are small
integers (|sim| <= 256, exact in f32), within-tile argmax takes the first
maximum via an iota/min trick and cross-tile updates use strict >, which
reproduces jnp.argmax's lowest-index tie-breaking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_WT = 512                     # words per lane tile


def _unpack_pm1_2d(packed):
    """(N, 8) uint32 -> (N, 256) ±1 f32, word-major bit order (matches
    ops/orb.unpack_pm1).  Mosaic idioms per ops/pallas/hamming.py: no
    uint32→f32 cast (extract on int32) and no (N, 8, 32) → (N, 256)
    shape-cast (unpack word-by-word in 2D, concatenate along lanes)."""
    shifts = jnp.arange(32, dtype=jnp.int32)
    words = [
        (jax.lax.shift_right_logical(packed[:, w:w + 1], shifts[None, :]) & 1)
        for w in range(8)
    ]
    bits = jnp.concatenate(words, axis=1)        # (N, 256) int {0,1}
    return bits.astype(jnp.float32) * 2.0 - 1.0


def _make_kernel(n_pad: int, v: int, wt: int):
    n_tiles = v // wt

    def kernel(desc_ref, valid_ref, words_ref, tf_ref):
        d = _unpack_pm1_2d(desc_ref[:])                 # (Np, 256)
        validf = valid_ref[:]                           # (Np, 1) f32

        big = jnp.float32(-3.0e38)
        run_max = jnp.full((n_pad, 1), big)
        run_arg = jnp.zeros((n_pad, 1), jnp.float32)
        for t in range(n_tiles):
            w = words_ref[pl.ds(t * wt, wt), :]         # (wt, 256)
            sim = jax.lax.dot_general(
                d, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # (Np, wt)
            t_max = jnp.max(sim, axis=1, keepdims=True)
            # Mosaic iota must be integer; cast to f32 after (int32->f32 ok).
            iota = jax.lax.broadcasted_iota(jnp.int32, (n_pad, wt),
                                            1).astype(jnp.float32)
            t_arg = jnp.min(jnp.where(sim == t_max, iota, jnp.float32(wt)),
                            axis=1, keepdims=True)
            upd = t_max > run_max
            run_max = jnp.where(upd, t_max, run_max)
            run_arg = jnp.where(upd, t_arg + t * wt, run_arg)

        for t in range(n_tiles):
            iota = jax.lax.broadcasted_iota(jnp.int32, (n_pad, wt),
                                            1).astype(jnp.float32)
            hit = jnp.where(iota + t * wt == run_arg, 1.0, 0.0) * validf
            tf_ref[0, pl.ds(t * wt, wt)] = jnp.sum(hit, axis=0,
                                                   keepdims=True)[0]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def bow_tf_pallas(desc_packed, valid, words_pm1, interpret: bool | None = None):
    """(N, 8) uint32 descriptors + (N,) valid + (V, 256) ±1 words ->
    (V,) term-frequency histogram (count of descriptors whose nearest word
    is v).  The caller applies idf and L1-normalizes (bow.transform)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N = desc_packed.shape[0]
    V = words_pm1.shape[0]
    assert V % _WT == 0, V
    n_pad = ((N + 255) // 256) * 256
    dp = jnp.zeros((n_pad, 8), jnp.uint32).at[:N].set(desc_packed)
    # Bitcast to int32 outside the kernel (Mosaic has no uint32 casts —
    # ops/pallas/hamming.py idiom; logical shifts are bit-identical).
    dp = jax.lax.bitcast_convert_type(dp, jnp.int32)
    vf = jnp.zeros((n_pad, 1), jnp.float32).at[:N, 0].set(
        valid.astype(jnp.float32))

    kernel = _make_kernel(n_pad, V, _WT)
    tf = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((n_pad, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, V), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, V), jnp.float32),
    )(dp, vf, words_pm1)
    return tf[0]
