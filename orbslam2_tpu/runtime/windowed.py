"""Windowed SLAM-mode engine: W tracked frames per device program.

Measured on the bench chip, every device *execution* through the runtime
costs ~25-35 ms of launch/transfer latency regardless of its compute
(runtime/streaming.py header) — the reason LOC-mode streaming windows hit
70+ fps while the one-dispatch-per-frame SLAM loop floored near 10.  This
module brings the same amortization to full SLAM mode:

  * a ``lax.scan`` tracks W frames in one program — frontend, constant-
    velocity prediction, two-stage matching + pose optimization, the ×2
    widen retry AND the TrackReferenceKeyFrame fallback all in-device
    (Tracking.cc:967,1030,855 — the fallback was the last host round
    trip in the per-frame loop);
  * per-frame summaries, FrameData, associations, and poses come back
    stacked, so the host replays the keyframe decision (NeedNewKeyFrame,
    Tracking.cc:1076) per frame from ONE [W, 40] fetch;
  * when frame j of the window needs a keyframe, the fused mapping step
    runs on frame j's stacked row (indexing happens in-device).  Frames
    j+1..W−1 of the same window tracked against the pre-insert map — the
    same ≤W-frame staleness the reference exhibits whenever LocalMapping
    is busy (its tracking thread also proceeds while the keyframe waits
    in the queue, LocalMapping.cc:114).

Tracking-state edge cases (initialization, LOST→relocalization,
localization mode) fall back to the per-frame engine paths — they are
rare, and correctness there matters more than latency.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.config import MONOCULAR, RGBD, STEREO, SlamConfig
from orbslam2_tpu.models import frame as frame_mod
from orbslam2_tpu.models import map_state as M
from orbslam2_tpu.runtime import local_mapping, tracking
from orbslam2_tpu.runtime.slam import SlamEngine, TrajectoryEntry


class SlamWindowOut(NamedTuple):
    summaries: jax.Array    # [W, 40]
    fds: frame_mod.FrameData  # stacked [W, ...]
    assocs: jax.Array       # [W, N]
    inliers: jax.Array      # [W, N]
    Tcws: jax.Array         # [W, 4, 4]
    state_T: jax.Array      # [2, 4, 4] (last, previous)
    last_assoc: jax.Array   # [N]
    last_inlier: jax.Array  # [N]
    counters: jax.Array     # [2, P]


def make_slam_window_tracker(cfg: SlamConfig, window: int):
    fns = tracking.make_tracking_fns(cfg)
    H, W_img = cfg.camera.height, cfg.camera.width
    B = window
    th_local = float(cfg.tracking.local_map_tracking_threshold)
    min_ref = float(cfg.tracking.min_matches_ref_keyframe)

    # payload = tuple of B per-frame flat buffers, device_put on frame
    # ARRIVAL (windowed engine _push) so the ~0.6 MB/frame H2D rides the
    # tunnel while the previous window computes — measured 49 ms/window
    # inline vs free when overlapped (probe_dispatch_overhead.py); the
    # stack happens inside the program where it fuses.
    if cfg.sensor == STEREO:
        frontend = frame_mod.make_frontend_stereo(cfg)

        def decode(payload, i):
            imgs = jnp.stack(payload).reshape(B, 2, H, W_img).astype(
                jnp.float32)
            return frontend(imgs[i, 0], imgs[i, 1])
    elif cfg.sensor == RGBD:
        frontend = frame_mod.make_frontend_rgbd(cfg)

        def decode(payload, i):
            g = jnp.stack([p[0] for p in payload]).reshape(
                B, H, W_img).astype(jnp.float32)
            d = jnp.stack([p[1] for p in payload]).reshape(B, H, W_img)
            return frontend(g[i], d[i])
    else:
        frontend = frame_mod.make_frontend_mono(cfg)

        def decode(payload, i):
            g = jnp.stack(payload).reshape(B, H, W_img).astype(jnp.float32)
            return frontend(g[i])

    @jax.jit
    def track_window(ms: M.MapState, payload, state_T: jax.Array,
                     assoc0: jax.Array, inlier0: jax.Array,
                     ref_kf: jax.Array) -> SlamWindowOut:
        P = ms.P

        def step(carry, i):
            T_prev, T_prev2, assoc, ok, vis, fnd = carry
            fd = decode(payload, i)
            vel = T_prev @ jnp.linalg.inv(T_prev2)
            pred = vel @ T_prev
            res = fns.track_body(ms, fd, pred, assoc, ok, ref_kf,
                                 widen_in_device=True)

            # TrackReferenceKeyFrame fallback in-device (Tracking.cc:419):
            # when local-map inliers collapse, re-track from a brute-force
            # match against the reference keyframe
            def fallback(_):
                ref = fns.track_ref_kf(ms, fd, ref_kf, T_prev)
                res2 = fns.track_body(ms, fd, ref.Tcw, ref.assoc,
                                      ref.inlier, ref_kf,
                                      widen_in_device=True)
                use = ((ref.summary[32] >= min_ref)
                       & (res2.summary[34] > res.summary[34]))
                return jax.tree_util.tree_map(
                    lambda a, b: jnp.where(use, a, b), res2, res)

            res = jax.lax.cond(res.summary[34] < th_local, fallback,
                               lambda _: res, None)
            vis = vis + res.visible_mask.astype(jnp.int32)
            fnd = fnd + res.found_mask.astype(jnp.int32)
            carry = (res.Tcw, T_prev, res.assoc, res.inlier, vis, fnd)
            ys = (res.summary, fd, res.assoc, res.inlier, res.Tcw)
            return carry, ys

        zeros = jnp.zeros((P,), jnp.int32)
        carry0 = (state_T[0], state_T[1], assoc0, inlier0, zeros, zeros)
        (Tl, Tp, assoc, inl, vis, fnd), ys = jax.lax.scan(
            step, carry0, jnp.arange(B))
        summaries, fds, assocs, inliers, Tcws = ys
        return SlamWindowOut(
            summaries=summaries, fds=fds, assocs=assocs, inliers=inliers,
            Tcws=Tcws, state_T=jnp.stack([Tl, Tp]), last_assoc=assoc,
            last_inlier=inl, counters=jnp.stack([vis, fnd]))

    return track_window


def make_window_mapping_step(cfg: SlamConfig):
    """The fused per-keyframe mapping step, fed by stacked window rows —
    frame selection (index j) happens in-device, so keyframe creation
    stays one dispatch."""
    mstep = local_mapping.make_mapping_step(cfg)

    @jax.jit
    def window_kf_step(ms, fds, assocs, Tcws, j, kf_slot, kf_ordinal,
                       parent, frame_id, timestamp, do_ba, do_cull,
                       vis, fnd):
        fd = jax.tree_util.tree_map(lambda x: x[j], fds)
        return mstep(ms, fd, Tcws[j], assocs[j], kf_slot, kf_ordinal,
                     parent, frame_id, timestamp, do_ba, do_cull, vis, fnd)

    return window_kf_step


class WindowedSlamEngine(SlamEngine):
    """SLAM engine tracking in windows of ``window`` frames.

    ``track_stereo``/``track_rgbd`` buffer frames and return the most
    recently *retired* pose (≤ window−1 frames behind; None until the
    first window retires).  Call :meth:`flush` before reading
    trajectories (``frame_poses`` does it automatically).
    """

    def __init__(self, cfg: SlamConfig, enable_loop_closing: bool = True,
                 vocabulary=None, window: int = 4):
        super().__init__(cfg, enable_loop_closing=enable_loop_closing,
                         vocabulary=vocabulary)
        # mono: the H/F bootstrap stays host-driven (per-frame path);
        # once initialized, tracking windows run exactly like stereo/RGBD
        self.window = window
        self.f_track_window = make_slam_window_tracker(cfg, window)
        self.f_window_kf = make_window_mapping_step(cfg)
        self._buf: List[Tuple] = []          # (payload parts, timestamp)
        self._last_retired: Optional[np.ndarray] = None

    # ------------------------------------------------------------- prewarm
    def prewarm(self, localization: bool = False) -> None:
        """Base prewarm (per-frame fallback path, mapping, reloc, loop
        programs) + the window tracker and windowed mapping step."""
        super().prewarm(localization=localization)
        H, W_img = self.cfg.camera.height, self.cfg.camera.width
        B = self.window
        if self.cfg.sensor == STEREO:
            pay = tuple(np.zeros(2 * H * W_img, np.uint8)
                        for _ in range(B))
        elif self.cfg.sensor == MONOCULAR:
            pay = tuple(np.zeros(H * W_img, np.uint8) for _ in range(B))
        else:
            pay = tuple((np.zeros(H * W_img, np.uint8),
                         np.zeros(H * W_img, np.float32))
                        for _ in range(B))
        N = self.cfg.orb.n_features_padded
        assoc = jnp.full((N,), -1, jnp.int32)
        inl = jnp.zeros((N,), bool)
        state_T = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (2, 1, 1))
        out = self.f_track_window(self.ms, pay, state_T, assoc, inl,
                                  jnp.int32(0))
        zp = self._zeros_p
        _ms, stats = self.f_window_kf(
            self.ms, out.fds, out.assocs, out.Tcws, jnp.int32(0),
            jnp.int32(0), jnp.int32(0), jnp.int32(-1), jnp.int32(0),
            jnp.float32(0.0), jnp.bool_(True), jnp.bool_(True), zp, zp)
        jax.block_until_ready(stats)

    # --------------------------------------------------------- frame entry
    def track_stereo(self, left, right, timestamp: float):
        if self.state != tracking.OK:
            return super().track_stereo(left, right, timestamp)
        self._last_image = left
        # device_put at ARRIVAL: the 0.6 MB/frame upload rides the tunnel
        # asynchronously while the in-flight window computes (the inline
        # transfer cost 49 ms/window, probe_dispatch_overhead.py)
        pay = jax.device_put(np.concatenate([
            np.ascontiguousarray(left, dtype=np.uint8).reshape(-1),
            np.ascontiguousarray(right, dtype=np.uint8).reshape(-1)]))
        return self._push(pay, timestamp)

    def track_rgbd(self, gray, depth, timestamp: float):
        if self.state != tracking.OK:
            return super().track_rgbd(gray, depth, timestamp)
        self._last_image = gray
        pay = (jax.device_put(
                   np.ascontiguousarray(gray, dtype=np.uint8).reshape(-1)),
               jax.device_put(
                   np.ascontiguousarray(depth,
                                        dtype=np.float32).reshape(-1)))
        return self._push(pay, timestamp)

    def track_monocular(self, gray, timestamp: float):
        if self.state != tracking.OK:
            return super().track_monocular(gray, timestamp)
        self._last_image = gray
        pay = jax.device_put(
            np.ascontiguousarray(gray, dtype=np.uint8).reshape(-1))
        return self._push(pay, timestamp)

    def _overlay_data(self):
        """Windowed engines keep FrameData on device; the overlay fetches
        the last retired window's final row on demand (viewer poll rate,
        not frame rate)."""
        out = getattr(self, "_last_out", None)
        if out is None:
            return super()._overlay_data()
        j = self.window - 1
        matched = (np.asarray(out.last_assoc) >= 0) \
            & np.asarray(out.last_inlier)
        return (np.asarray(out.fds.xy_raw[j]),
                np.asarray(out.fds.valid[j]), matched)

    def _push(self, pay, timestamp: float):
        self._buf.append((pay, timestamp))
        if len(self._buf) >= self.window:
            buf, self._buf = self._buf, []
            if self.cfg.sensor == MONOCULAR:
                # NO cross-window pipeline for mono: map points appear
                # only through triangulation at keyframe inserts, so a
                # whole window tracked against a pre-insert map runs out
                # of coverage under motion (stereo/RGBD mint depth points
                # at the insert itself and tolerate the staleness).
                # Windows still amortize dispatch; they just retire
                # before the next one launches.
                self._pending = self._dispatch_window(buf)
                self._retire_pending()
            else:
                # software pipeline: dispatch window k+1 from window k's
                # DEVICE outputs (state_T/assoc need no host fetch), THEN
                # retire window k (summary fetch + keyframe work) while
                # the new window computes.  Tracking therefore runs
                # against a map ≤1 window stale — the same contract as
                # the reference's tracking thread racing its busy
                # LocalMapping queue.
                disp = self._dispatch_window(buf)
                self._retire_pending()
                if self.state == tracking.OK:
                    self._pending = disp
                else:
                    # the retired window lost tracking — the in-flight
                    # window was predicted from a junk pose; reprocess its
                    # frames through the per-frame LOST/reloc path
                    for pay2, ts2 in disp["buf"]:
                        self._last_retired = SlamEngine._track_common(
                            self, pay2, ts2)
        return self._last_retired

    def flush(self):
        """Retire the in-flight window and drain the partial buffer +
        deferred keyframe/loop work."""
        self._retire_pending()
        self._retire_kf_stats()
        if self.loop_closer is not None:
            self.ms, closed = self.loop_closer.poll_deferred(self.ms)
            if closed:
                self.stats["loops_closed"] += 1
                self.velocity = None
        buf, self._buf = self._buf, []
        for pay, ts in buf:
            self._last_retired = super()._track_common(pay, ts)

    def finish_gba(self) -> bool:
        self.flush()
        return super().finish_gba()

    def _auto_reset(self) -> None:
        # Drop windowed in-flight state BEFORE the base reset: deferred
        # keyframe stats, the pending window, buffered frames and the
        # motion-model history all refer to the pre-reset map — retiring
        # them afterwards would overwrite n_live_points with a stale
        # count and replay culled-slot bookkeeping against the fresh map
        # (ADVICE r4, medium).
        self._deferred_stats = []
        self._pending = None
        self._pending_counters = None
        self._prev2_Tcw = None
        self._buf = []
        self._last_retired = None
        self._last_out = None
        super()._auto_reset()

    def frame_poses(self):
        self.flush()
        return super().frame_poses()

    # ------------------------------------------------------------- window
    def _window_payload(self, buf):
        # tuple of per-frame device buffers (already device_put at
        # arrival); stacking happens inside the window program
        return tuple(p for p, _ in buf)

    def _dispatch_window(self, buf):
        """Issue the window program from device-resident state; no fetch."""
        pend = getattr(self, "_pending", None)
        if pend is not None:
            state_T, assoc0, inl0 = (pend["out"].state_T,
                                     pend["out"].last_assoc,
                                     pend["out"].last_inlier)
        else:
            prev2 = getattr(self, "_prev2_Tcw", None)
            if self.velocity is not None and prev2 is not None:
                sT = np.stack([self.last_Tcw, prev2]).astype(np.float32)
            else:
                sT = np.stack([self.last_Tcw,
                               self.last_Tcw]).astype(np.float32)
            state_T, assoc0, inl0 = (jnp.asarray(sT), self.last_assoc,
                                     self.last_inlier)
        out = self.f_track_window(
            self.ms, self._window_payload(buf), state_T, assoc0, inl0,
            jnp.int32(self.ref_kf))
        return {"out": out, "buf": buf, "ref": self.ref_kf}

    def _retire_kf_stats(self):
        pending = getattr(self, "_deferred_stats", None)
        if not pending:
            return
        self._deferred_stats = []
        for stats_dev in pending:
            stats = np.asarray(stats_dev)
            self.stats["mp_created"] += int(stats[0]) + int(stats[2])
            self.stats["mp_culled"] += int(stats[1])
            self.stats["mp_fused"] += int(stats[3])
            self.stats["ba_outliers"] += int(stats[4])
            self.stats["kf_culled"] += int(stats[5])
            self.n_live_points = int(stats[6])
            victims = [int(v) for v in stats[7:] if v >= 0]
            if victims:
                self._on_kfs_culled(self.ms, victims)

    def _retire_pending(self):
        pend = getattr(self, "_pending", None)
        if pend is None:
            self._retire_kf_stats()
            return
        self._pending = None
        out, buf, ref_at_track = pend["out"], pend["buf"], pend["ref"]
        t = self.cfg.tracking
        sms = np.asarray(out.summaries)          # the ONE per-window fetch
        self._retire_kf_stats()                  # previous window's mapping
        if self.loop_closer is not None:
            self.ms, closed = self.loop_closer.poll_deferred(self.ms)
            self.ms, merged = self.loop_closer.gba.poll_and_merge(self.ms)
            if closed or merged:
                self.stats["loops_closed"] += int(closed)
                # poses moved wholesale — restart the motion model and the
                # in-flight window is now stale; it will re-anchor at its
                # own retire through the BA-corrected reference keyframes
                self.velocity = None
                self.last_Tcw = np.asarray(self.ms.kf_pose[self.ref_kf])

        # keyframe cadence is set by the POLICY, not the window size: every
        # frame of the window may insert (the reference's queue accepts
        # multiple keyframes while LocalMapping drains, LocalMapping.cc:114;
        # VERDICT r3 weak #6: a 1-per-window cap under-samples fast motion).
        # After an in-window insert, later frames' c2 compares against the
        # inserting frame's inliers instead of the stale pre-insert
        # reference counts (see _need_new_keyframe ref_override).
        ref_override = None
        for j, (pay, ts) in enumerate(buf):
            sm = tracking.Summary(sms[j])
            lost = sm.n_inliers_map < t.local_map_tracking_threshold
            if lost:
                # frames after j tracked from a junk pose — reprocess them
                # (and frame j) through the per-frame LOST/reloc path
                self.state = tracking.LOST
                self.velocity = None
                for pay2, ts2 in buf[j:]:
                    self._last_retired = super()._track_common(pay2, ts2)
                return
            self._append_traj(TrajectoryEntry(
                ts, sm.Tcr, ref_at_track, False))
            if self.last_Tcw is not None:
                self.velocity = sm.Tcw @ np.linalg.inv(self.last_Tcw)
            self._prev2_Tcw = self.last_Tcw
            self.last_Tcw = sm.Tcw

            # keyframe decision BEFORE the id advances (base-path order)
            if (not self.localization_only
                    and self._need_new_keyframe(sm, ref_override)):
                self._create_window_keyframe(out, j, ts)
                ref_override = sm.n_inliers_map
                if self.cfg.sensor == MONOCULAR and j + 1 < len(buf):
                    # mono: the rest of the window was tracked against the
                    # pre-insert map, which lacks the freshly triangulated
                    # points — reprocess those frames per-frame against
                    # the NEW map instead of retiring stale results
                    self.frame_id += 1
                    self.last_assoc = self.ms.kf_mp[self.ref_kf]
                    self.last_inlier = jnp.ones_like(self.last_inlier)
                    self._pending_counters = None
                    for pay2, ts2 in buf[j + 1:]:
                        self._last_retired = SlamEngine._track_common(
                            self, pay2, ts2)
                    return
            self.frame_id += 1
        self.state = tracking.OK
        self.last_assoc = out.last_assoc
        self.last_inlier = out.last_inlier
        self._pending_counters = out.counters
        self._last_out = out            # frame_overlay source
        self._last_retired = self.last_Tcw

    def _mapper_idle(self) -> bool:
        """LocalMapping::AcceptKeyFrames semantics for the windowed
        engine: a mapping program still EXECUTING on device is the busy
        mapping thread (the base engine's always-idle answer let c1b
        fire every window and inflated keyframe cadence ~20% beyond the
        reference's throttle).  Busy-ness is polled from the stats
        future (`is_ready`), not from the retire bookkeeping: counting
        every un-retired program as busy held the flag up for a whole
        window+, which starved monocular keyframe insertion — mono only
        mints map points at inserts and NeedNewKeyFrame drops mono
        inserts outright while the mapper is busy (Tracking.cc:1149)."""
        pend = getattr(self, "_deferred_stats", None)
        if not pend:
            return True
        try:
            return all(s.is_ready() for s in pend)
        except AttributeError:          # non-array stand-ins in tests
            return True

    def _mapping_queue_len(self) -> int:
        pend = getattr(self, "_deferred_stats", None) or []
        try:
            return sum(0 if s.is_ready() else 1 for s in pend)
        except AttributeError:
            return len(pend)

    def _counter_args(self):
        c = getattr(self, "_pending_counters", None)
        if c is None:
            return self._zeros_p, self._zeros_p
        self._pending_counters = None
        return c[0], c[1]

    def _create_window_keyframe(self, out: SlamWindowOut, j: int,
                                timestamp: float) -> None:
        kf_slot = self._take_kf_slot()
        vis, fnd = self._counter_args()
        do_ba = bool(self.kf_ordinal >= 3)
        do_cull = bool(self.kf_ordinal >= 5)
        ms, stats_dev = self.f_window_kf(
            self.ms, out.fds, out.assocs, out.Tcws, jnp.int32(j),
            jnp.int32(kf_slot), jnp.int32(self.kf_ordinal),
            jnp.int32(self.ref_kf), jnp.int32(self.frame_id),
            jnp.float32(timestamp), jnp.bool_(do_ba), jnp.bool_(do_cull),
            vis, fnd)
        # stats stay on device — fetching now would block until the
        # mapping program drains; start an async copy and retire the
        # bookkeeping next window (a list: several keyframes may insert
        # within one window)
        try:
            stats_dev.copy_to_host_async()
        except AttributeError:
            pass
        if not getattr(self, "_deferred_stats", None):
            self._deferred_stats = []
        self._deferred_stats.append(stats_dev)
        self.ms = ms
        self.kf_ordinal += 1
        self.n_kfs += 1
        self.stats["kf_inserted"] += 1
        self.ref_kf = kf_slot
        self.last_kf_frame_id = self.frame_id

        if self.loop_closer is not None:
            # dispatch-only; candidates are evaluated at the next retire
            self.loop_closer.on_keyframe_deferred(
                self.ms, kf_slot, self.kf_ordinal)
