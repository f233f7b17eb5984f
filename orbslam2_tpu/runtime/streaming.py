"""Streaming window tracking: N frames per device program.

Motivation: the per-frame SLAM loop needs one device→host transfer per
frame for the state machine.  On hosts where the accelerator is
remote-attached, that round trip dominates (tens of ms); even locally it
caps latency.  The TPU-native answer is to keep the whole *tracking*
recurrence on device: a ``lax.scan`` over a window of frames runs frontend
→ motion-model matching → pose optimization → local-map matching → pose
optimization per frame, carrying (pose, velocity, associations) across
frames, and returns all poses + per-frame summaries in ONE transfer.

This is the throughput mode for localization-only serving (the reference's
LOC benchmarks, executeBenchmarks.sh) and the batched front half of SLAM
mode: keyframe decisions are made at window granularity by the host from
the returned summaries (window size bounds keyframe latency, typically
4-8 frames at camera rate).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from orbslam2_tpu.config import SlamConfig
from orbslam2_tpu.models import frame as frame_mod
from orbslam2_tpu.models import map_state as M
from orbslam2_tpu.runtime import tracking


class WindowResult(NamedTuple):
    poses: jax.Array       # [B, 4, 4] per-frame Tcw
    summaries: jax.Array   # [B, 40] per-frame packed summaries
    assoc: jax.Array       # [N] final frame's associations
    inlier: jax.Array      # [N]
    visible_total: jax.Array  # [P] int32 accumulated visible counts
    found_total: jax.Array    # [P] int32 accumulated found counts


def make_window_tracker(cfg: SlamConfig):
    """Build track_window: (ms, left[B,H,W], right[B,H,W], state…) → WindowResult."""
    # reuse the engine's jitted pieces — jit-of-jit inlines them
    _, track_fn, *_ = tracking.make_tracking_fns(cfg)
    frontend = frame_mod.make_frontend_stereo(cfg)

    @jax.jit
    def track_window(ms: M.MapState,
                     left: jax.Array, right: jax.Array,
                     Tcw_prev: jax.Array, Tcw_prev2: jax.Array,
                     assoc0: jax.Array, inlier0: jax.Array,
                     ref_kf: jax.Array) -> WindowResult:
        P = ms.P

        def step(carry, xs):
            T_prev, T_prev2, assoc, inl, vis, fnd = carry
            l, r = xs
            fd = frontend(l, r)
            # constant-velocity prediction (Tracking.cc:967)
            vel = T_prev @ jnp.linalg.inv(T_prev2)
            pred = vel @ T_prev
            res = track_fn(ms, fd, pred, assoc, inl, ref_kf)
            vis = vis + res.visible_mask.astype(jnp.int32)
            fnd = fnd + res.found_mask.astype(jnp.int32)
            carry = (res.Tcw, T_prev, res.assoc, res.inlier, vis, fnd)
            return carry, (res.Tcw, res.summary)

        zeros = jnp.zeros((P,), jnp.int32)
        (Tl, _, assoc, inl, vis, fnd), (poses, summaries) = jax.lax.scan(
            step, (Tcw_prev, Tcw_prev2, assoc0, inlier0, zeros, zeros),
            (left, right))
        return WindowResult(poses=poses, summaries=summaries, assoc=assoc,
                            inlier=inl, visible_total=vis, found_total=fnd)

    return track_window
