"""Pallas TPU kernel: the sequential Madgwick attitude chain of an IMU packet.

The per-frame IMU update (vimotion.imu_feed_batch, replacing the reference's
per-sample viIMUPropagation loop, /root/reference/src/processing/
vi_motion.cpp:139-209) is a chain of ~40 tiny vector ops per sample that is
inherently sequential in the attitude quaternion.  As XLA ops — rolled scan
or fully unrolled — the chain is op-dispatch bound: 16 samples measured 0.64
ms/frame on TPU (tools/profile_imu_parts.py), ~1 µs per micro-op, dwarfing
the actual arithmetic.  Everything batchable (dt, bias removal, the gyro
delta-quaternion exp, accelerometer trust weights, the position/velocity
cumsums) is precomputed OUTSIDE this kernel with vectorized ops; only the
irreducible recurrence

    q_k = normalize( (q_{k-1} ⊗ G_k) ⊗ exp(c_k · a_k × ĝ(q_{k-1} ⊗ G_k)) )

runs here, statically unrolled inside ONE kernel so the whole chain costs
one dispatch.  G_k (gyro delta quat) is precomputed; the accel-correction
exp uses a 2nd-order small-angle series.  The correction angle is bounded by
|c_k·err| ≤ 10·β·dt ≈ 0.025 rad (default madgwick_beta=0.05 with the 0.05 s
dt clip, |a × ĝ| ≤ 1); the series error is O(θ⁴) ≈ 1e-7 there (then
renormalized), so parity with the pure-JAX reference chain is ~1e-7.

Mosaic idioms (see CLAUDE.md): all intermediates are (1,1)/(1,N) 2D blocks —
never 0-/1-D — and the only transcendental is rsqrt.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _quat_mul(aw, ax, ay, az, bw, bx, by, bz):
    """Hamilton product on (1,1) component blocks (so3.mul convention)."""
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    )


def _kernel(q0_ref, g_ref, a_ref, c_ref, out_ref):
    P = g_ref.shape[0]
    qw = q0_ref[0:1, 0:1]
    qx = q0_ref[0:1, 1:2]
    qy = q0_ref[0:1, 2:3]
    qz = q0_ref[0:1, 3:4]
    for i in range(P):  # static unroll INSIDE the kernel: one dispatch total
        gw = g_ref[i:i + 1, 0:1]
        gx = g_ref[i:i + 1, 1:2]
        gy = g_ref[i:i + 1, 2:3]
        gz = g_ref[i:i + 1, 3:4]
        # q_prop = q ⊗ G_i
        qw, qx, qy, qz = _quat_mul(qw, qx, qy, qz, gw, gx, gy, gz)
        # ĝ = R(q_prop)ᵀ z — predicted gravity direction in the IMU frame
        gpx = 2.0 * (qx * qz - qw * qy)
        gpy = 2.0 * (qy * qz + qw * qx)
        gpz = 1.0 - 2.0 * (qx * qx + qy * qy)
        ax = a_ref[i:i + 1, 0:1]
        ay = a_ref[i:i + 1, 1:2]
        az = a_ref[i:i + 1, 2:3]
        c = c_ref[i:i + 1, 0:1]
        # rotation vector v = c · (a × ĝ)
        vx = c * (ay * gpz - az * gpy)
        vy = c * (az * gpx - ax * gpz)
        vz = c * (ax * gpy - ay * gpx)
        # corr = exp(v), 2nd-order small-angle series (renormalized below)
        th2 = vx * vx + vy * vy + vz * vz
        cw = 1.0 - 0.125 * th2
        s = 0.5 * (1.0 - th2 * (1.0 / 24.0))
        qw, qx, qy, qz = _quat_mul(qw, qx, qy, qz, cw, s * vx, s * vy, s * vz)
        inv = jax.lax.rsqrt(qw * qw + qx * qx + qy * qy + qz * qz)
        qw = qw * inv
        qx = qx * inv
        qy = qy * inv
        qz = qz * inv
        out_ref[i:i + 1, 0:1] = qw
        out_ref[i:i + 1, 1:2] = qx
        out_ref[i:i + 1, 2:3] = qy
        out_ref[i:i + 1, 3:4] = qz


def attitude_chain_ref(q0, G, a_unit, c):
    """Pure-JAX oracle (and CPU path): the same recurrence with exact exp."""
    from ...geometry import so3

    def step(q, xs):
        g, a, ck = xs
        qp = so3.mul(q, g)
        g_pred = so3.rotate(so3.conj(qp), jnp.asarray([0.0, 0.0, 1.0], q.dtype))
        err = jnp.cross(a, g_pred)
        q = so3.normalize(so3.mul(qp, so3.exp(err * ck)))
        return q, q

    _, qs = jax.lax.scan(step, q0, (G, a_unit, c), unroll=True)
    return qs


@functools.partial(jax.jit, static_argnames=("interpret",))
def attitude_chain_pallas(q0, G, a_unit, c, interpret: bool = False):
    """The kernel itself; interpret=True runs it on CPU for parity tests."""
    P = G.shape[0]
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((P, 4), q0.dtype),
        interpret=interpret,
    )(q0[None, :], G, a_unit, c[:, None])


def attitude_chain(q0, G, a_unit, c, use_kernel: bool | None = None):
    """Sequential Madgwick attitude chain.

    q0 (4,) start quaternion; G (P,4) per-sample gyro delta quaternions
    (identity rows for masked samples); a_unit (P,3) unit accelerometer
    directions; c (P,) correction gains (0 for masked samples).
    Returns (P,4) quaternions after each sample.

    Dispatch: the fused kernel on TPU; on other backends the unrolled
    pure-JAX chain (faster than an interpreted kernel, and the parity
    oracle anyway).  CAVEAT: the default selection reads
    jax.default_backend() at TRACE time — if the enclosing jit targets a
    non-default device (e.g. explicit CPU placement inside a TPU-default
    process) the wrong branch would be baked in; pass use_kernel
    explicitly in that situation.
    """
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    if not use_kernel:
        return attitude_chain_ref(q0, G, a_unit, c)
    return attitude_chain_pallas(q0, G, a_unit, c)
