"""Isolate imu_feed_batch cost: integrator scan vs ring scatter writeback.

Times, in a 64-frame outer scan (so per-frame cost is honest and RTT
amortized), three variants of the per-frame IMU packet update:
  a) full imu_feed_batch (scan + 6 scatters)
  b) integrator scan only (no ring writeback; scalars only)
  c) scatter writeback only (rows = raw inputs, no scan)

    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_imu_parts.py
"""

import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from flvis_tpu.config import VioConfig
    from flvis_tpu.utils.timing import sync
    from flvis_tpu.vio import vimotion

    vcfg = VioConfig()
    P, T = 16, 64
    rng = np.random.default_rng(0)
    acc = jnp.asarray(rng.normal([0, 0, 9.81], 0.1, (T, P, 3)).astype(np.float32))
    gyro = jnp.asarray(rng.normal(0, 0.05, (T, P, 3)).astype(np.float32))
    ts = jnp.asarray((np.arange(T * P) * 0.005).reshape(T, P).astype(np.float32))
    vv = jnp.ones((T, P), bool)

    def time_variant(name, frame_fn):
        @jax.jit
        def run(st, off):
            def step(st, xs):
                a, g, t, v = xs
                return frame_fn(st, a, g, t + off, v), None
            st, _ = jax.lax.scan(step, st, (acc, gyro, ts, vv))
            return st
        st = vimotion.init_state(vcfg)
        for r in range(2):
            st = run(st, jnp.asarray(r * (T * P * 0.005 + 1.0)))
        sync(st.q)
        reps = 8
        t0 = time.perf_counter()
        for r in range(reps):
            st = run(st, jnp.asarray((2 + r) * (T * P * 0.005 + 1.0)))
        sync(st.q)
        ms = 1e3 * (time.perf_counter() - t0) / (reps * T)
        print(f"{name}: {ms:.3f} ms/frame")

    # a) full
    time_variant("full imu_feed_batch  ",
                 functools.partial(vimotion.imu_feed_batch, vcfg))

    # b) scan only: copy of the integrator carry chain, writing scalars only
    import dataclasses

    from flvis_tpu.geometry import so3
    from flvis_tpu.vio.vimotion import _attitude_from_gravity, _latest, _madgwick_step

    def scan_only(state, acc_b, gyro_b, t_b, valid):
        cfg = vcfg
        g_w = jnp.asarray([0.0, 0.0, -cfg.gravity])
        j = _latest(state)
        carry = (state.t[j], state.q[j], state.pos[j], state.vel[j],
                 state.bias_acc, state.bias_gyro, state.initialized,
                 state.init_acc_sum, state.init_gyro_sum, state.init_count)

        def step(carry, sample):
            t_l, q_l, p_l, v_l, ba, bg, inited, a_sum, g_sum, n_init = carry
            a, g, t, ok = sample

            def do_init(_):
                n = n_init + 1
                a_s = a_sum + a
                g_s = g_sum + g
                done = n >= cfg.init_samples
                q0 = _attitude_from_gravity(a_s / n.astype(a.dtype))
                bg2 = jnp.where(done, g_s / n.astype(a.dtype), bg)
                z = jnp.zeros(3, a.dtype)
                return (t, q0, z, z, ba, bg2, inited | done, a_s, g_s, n)

            def do_prop(_):
                dt = jnp.clip(t - t_l, 1e-4, 0.05)
                q = _madgwick_step(q_l, g - bg, a - ba, cfg.madgwick_beta, dt)
                acc_w = so3.rotate(q, a - ba) + g_w
                vel = v_l + acc_w * dt
                pos = p_l + v_l * dt + 0.5 * acc_w * dt * dt
                return (t, q, pos, vel, ba, bg, inited, a_sum, g_sum, n_init)

            new = jax.tree.map(lambda x, y: jnp.where(inited, x, y),
                               do_prop(None), do_init(None))
            carry = jax.tree.map(lambda x, y: jnp.where(ok, y, x), carry, new)
            return carry, None

        carry, _ = jax.lax.scan(step, carry,
                                (acc_b, gyro_b, t_b, valid), unroll=True)
        t_l, q_l, p_l, v_l, ba, bg, inited, a_sum, g_sum, n_init = carry
        # touch the ring head slot only (one dynamic_update_slice)
        return dataclasses.replace(
            state,
            t=state.t.at[state.head].set(t_l),
            q=state.q.at[state.head].set(q_l),
            bias_acc=ba, bias_gyro=bg, initialized=inited,
            init_acc_sum=a_sum, init_gyro_sum=g_sum,
            init_count=n_init, head=(state.head + 1) % state.t.shape[0],
            count=jnp.minimum(state.count + 1, state.t.shape[0]))

    time_variant("integrator scan only ", scan_only)

    # c) scatter only: rows = raw inputs
    def scatter_only(state, acc_b, gyro_b, t_b, valid):
        C = state.t.shape[0]
        vi = valid.astype(jnp.int32)
        n_ok = jnp.sum(vi)
        slot = (state.head + jnp.cumsum(vi) - vi) % C
        idx = jnp.where(valid, slot, C)
        q_rows = jnp.concatenate([t_b[:, None], acc_b], axis=1)
        return dataclasses.replace(
            state,
            t=state.t.at[idx].set(t_b, mode="drop"),
            q=state.q.at[idx].set(q_rows, mode="drop"),
            pos=state.pos.at[idx].set(acc_b, mode="drop"),
            vel=state.vel.at[idx].set(gyro_b, mode="drop"),
            acc=state.acc.at[idx].set(acc_b, mode="drop"),
            gyro=state.gyro.at[idx].set(gyro_b, mode="drop"),
            head=(state.head + n_ok) % C,
            count=jnp.minimum(state.count + n_ok, C))

    time_variant("scatter writeback only", scatter_only)


if __name__ == "__main__":
    main()
