"""Cross-device pipeline overlap: frontend and backend BA on separate chips.

The reference runs tracking and the sliding-window BA as separate ROS
nodelets whose threads overlap — tracking is never blocked by BA, and
corrections arrive one keyframe late (f2f_tracking.cpp:189-219,
vo_localmap.cpp:87-380).  The TPU-native equivalent needs no threads: JAX's
async dispatch IS the pipeline.  The tracker state lives on the frontend
device and the BA window on the backend device; at a keyframe the packet is
device_put to the backend (ICI copy) and the 12+8 Schur optimize is
DISPATCHED there — the host immediately continues dispatching the next
frames on the frontend device while the backend chip solves, and the
resulting Correction is transferred back and applied one frame later.
Identical numerics to the single-device stepwise path (same programs, same
one-keyframe-late feedback), with the BA latency hidden behind the next
frame's tracking.

For whole-sequence replay on ONE chip, the fused chunk programs
(pipeline.runner._chunk_fused*) remain the faster mode — this module is the
multi-chip LIVE-pipeline arrangement (one dispatch per frame).  The loop
closer's PGO can be placed on a third device via LoopCloser(pgo_device=...).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..backend import window_ba
from ..config import SystemConfig
from ..frontend import tracker
from ..geometry.camera import StereoCamera


class OverlappedPipeline:
    """Two-device frontend/backend pipeline (stepwise, per-frame)."""

    def __init__(self, cfg: SystemConfig, cam: StereoCamera,
                 fe_device=None, ba_device=None):
        devs = jax.devices()
        self.fe_dev = fe_device if fe_device is not None else devs[0]
        self.ba_dev = ba_device if ba_device is not None else \
            devs[1 % len(devs)]
        self.cfg = cfg
        self.cam_fe = jax.device_put(cam, self.fe_dev)
        self.cam_ba = jax.device_put(cam, self.ba_dev)
        self.fe_state = jax.device_put(tracker.init_state(cfg.frontend),
                                       self.fe_dev)
        self.ba_state = jax.device_put(window_ba.empty(cfg.backend),
                                       self.ba_dev)
        self.pending_corr: Optional[window_ba.Correction] = None
        self.trajectory: list = []
        self.ba_costs: list = []
        self._frames = 0

    def process_frame(self, img0, img1):
        cfg = self.cfg
        if self.pending_corr is not None:
            # One-keyframe-late feedback: transfer the backend's Correction
            # to the frontend chip and rebase (f2f_tracking.cpp:189-219).
            corr = jax.device_put(self.pending_corr, self.fe_dev)
            self.fe_state = tracker.apply_correction(self.fe_state, corr)
            self.pending_corr = None

        self.fe_state, out = tracker.track_frame(
            cfg.frontend, self.cam_fe, self.fe_state,
            jax.device_put(jnp.asarray(img0), self.fe_dev),
            jax.device_put(jnp.asarray(img1), self.fe_dev))

        if bool(out.reset_backend):
            self.ba_state = window_ba.reset(cfg.backend, self.ba_state)
        if bool(out.is_keyframe):
            pkt = tracker.make_keyframe_packet(self.fe_state, out)
            pkt_b = jax.device_put(pkt, self.ba_dev)
            # Dispatch the BA on the backend chip and DON'T wait: the host
            # returns to the next frame's frontend dispatch immediately; the
            # Correction handle resolves when the backend chip finishes.
            self.ba_state = window_ba.add_keyframe(cfg.backend, self.ba_state,
                                                   pkt_b)
            res = window_ba.optimize(cfg.backend, self.cam_ba, self.ba_state)
            self.ba_state = res.state
            self.pending_corr = res.correction
            self.ba_costs.append(res.cost)

        self.trajectory.append((self._frames,
                                np.asarray(out.T_c_w.q),
                                np.asarray(out.T_c_w.t)))
        self._frames += 1
        return out
