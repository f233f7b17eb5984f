"""Host-side SLAM engine: wires frontend + tracking + local mapping.

This is the control-plane analogue of ``Tracking::Track`` (Tracking.cc:366)
plus the LocalMapping loop — the data-dependent decisions (state machine,
fallbacks, keyframe policy) read back a handful of scalars per frame while
all array work stays in jitted functions on device.

The reference runs LocalMapping in its own thread with a keyframe queue
(System.cc:104, LocalMapping.cc:114); here mapping runs synchronously after
keyframe insertion by default, with the async path provided by
runtime/pipeline.py.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.config import MONOCULAR, RGBD, STEREO, SlamConfig
from orbslam2_tpu.models import frame as frame_mod
from orbslam2_tpu.models import map_state as M
from orbslam2_tpu.ops import triangulate as tri_mod
from orbslam2_tpu.runtime import local_mapping, tracking
from orbslam2_tpu.utils import lie


@dataclasses.dataclass
class TrajectoryEntry:
    """Per-frame relative pose record (Tracking.cc:588-605): Tcr = pose
    relative to the reference keyframe at track time, so trajectory export
    benefits from later keyframe corrections (System.cc:478-503)."""

    timestamp: float
    Tcr: np.ndarray
    ref_kf: int
    lost: bool


class SlamEngine:
    """Single-process engine for stereo / RGB-D sequences."""

    def __init__(self, cfg: SlamConfig, enable_loop_closing: bool = True,
                 vocabulary=None):
        self.cfg = cfg
        if cfg.sensor == STEREO:
            self.frontend = frame_mod.make_frontend_stereo(cfg)
        elif cfg.sensor == RGBD:
            self.frontend = frame_mod.make_frontend_rgbd(cfg)
        else:
            self.frontend = frame_mod.make_frontend_mono(cfg)
        (self.f_init, self.f_track, self.f_track_ref, self.f_insert_kf,
         self.f_ref_tracked, self.f_pose_cov,
         self.f_apply_counters) = tracking.make_tracking_fns(cfg)
        (self.f_local_ba, self.f_cull_mp, self.f_cull_kf,
         self.f_fuse) = local_mapping.make_mapping_fns(cfg)
        (self.f_triangulate,
         self.f_insert_tri) = tri_mod.make_triangulation_fn(cfg)
        self.f_covis_row = jax.jit(M.covisibility_row)
        self.loop_closer = None
        if enable_loop_closing:
            from orbslam2_tpu.models.vocabulary import default_vocabulary
            from orbslam2_tpu.runtime.loop_closing import LoopCloser
            voc = vocabulary if vocabulary is not None else default_vocabulary()
            self.loop_closer = LoopCloser(cfg, voc)

        self.ms = M.empty_map(cfg)
        self.state = tracking.NO_IMAGES_YET
        self.n_kfs = 0
        self.mp_top = 0               # allocation watermark for MP slots
        self.frame_id = 0
        self.last_kf_frame_id = 0
        self.ref_kf = 0
        self.velocity: Optional[np.ndarray] = None
        self.last_Tcw: Optional[np.ndarray] = None
        self.last_assoc = None        # device [N] int32
        self.last_inlier = None       # device [N] bool
        self.trajectory: List[TrajectoryEntry] = []
        self.ref_kf_tracked = 0       # tracked points in current ref KF
        self.localization_only = False
        self.stats = {"kf_inserted": 0, "mp_created": 0, "mp_culled": 0,
                      "kf_culled": 0, "ba_outliers": 0, "reloc": 0,
                      "mp_fused": 0, "loops_closed": 0}

    # ------------------------------------------------------------ tracking
    def track_stereo(self, left: np.ndarray, right: np.ndarray,
                     timestamp: float) -> Optional[np.ndarray]:
        fd = self.frontend(jnp.asarray(left, jnp.float32),
                           jnp.asarray(right, jnp.float32))
        return self._track_common(fd, timestamp)

    def track_rgbd(self, gray: np.ndarray, depth: np.ndarray,
                   timestamp: float) -> Optional[np.ndarray]:
        fd = self.frontend(jnp.asarray(gray, jnp.float32),
                           jnp.asarray(depth, jnp.float32))
        return self._track_common(fd, timestamp)

    def _track_common(self, fd, timestamp: float) -> Optional[np.ndarray]:
        if self.state in (tracking.NO_IMAGES_YET, tracking.NOT_INITIALIZED):
            ok = self._initialize(fd, timestamp)
            self.frame_id += 1
            return np.asarray(self.last_Tcw) if ok else None

        if self.state == tracking.LOST:
            return self._handle_lost(fd, timestamp)

        t = self.cfg.tracking
        Tcw_pred = self._predict_pose()
        # capture ONE consistent (map snapshot, reference-KF id) pair for
        # the whole frame: in the async engine the mapping worker swaps
        # both concurrently, and mixing a Tcr computed against the old ref
        # with the new ref id corrupts the reconstructed trajectory
        ms = self.ms
        ref_at_track = self.ref_kf
        ref_kf = jnp.int32(ref_at_track)
        res = self.f_track(ms, fd, jnp.asarray(Tcw_pred, jnp.float32),
                           self.last_assoc, self.last_inlier, ref_kf)
        # ONE device→host fetch per frame: everything the state machine
        # needs is packed in res.summary (a remote-attached TPU pays a full
        # tunnel round trip per fetch)
        sm = tracking.Summary(np.asarray(res.summary))
        if (sm.n_matches_mm < t.speedup_matches_threshold
                or sm.n_inliers_mm < t.motion_model_threshold):
            # widen the search window ×2 (Tracking.cc:985-996)
            res = self.f_track(ms, fd,
                               jnp.asarray(Tcw_pred, jnp.float32),
                               self.last_assoc, self.last_inlier, ref_kf,
                               wide=True)
            sm = tracking.Summary(np.asarray(res.summary))
        if sm.n_inliers_map < t.local_map_tracking_threshold:
            # motion model failed → TrackReferenceKeyFrame (Tracking.cc:419),
            # then re-run the full two-stage track from the recovered pose
            ref = self.f_track_ref(
                ms, fd, ref_kf, jnp.asarray(self.last_Tcw, jnp.float32))
            sm_ref = tracking.Summary(np.asarray(ref.summary))
            if sm_ref.n_matches_mm >= t.min_matches_ref_keyframe:
                res2 = self.f_track(ms, fd, ref.Tcw, ref.assoc,
                                    ref.inlier, ref_kf)
                sm2 = tracking.Summary(np.asarray(res2.summary))
                if sm2.n_inliers_map > sm.n_inliers_map:
                    res, sm = res2, sm2

        n_map_inliers = sm.n_inliers_map
        self._absorb_track_counters(res)
        # TrackLocalMap acceptance (Tracking.cc:1060-1072)
        lost = n_map_inliers < t.local_map_tracking_threshold
        if lost:
            self.state = tracking.LOST
            self.velocity = None
            self._record_traj(timestamp, None)
            self.frame_id += 1
            return None

        self.state = tracking.OK
        Tcw = sm.Tcw
        if self.last_Tcw is not None:
            self.velocity = Tcw @ np.linalg.inv(self.last_Tcw)
        self.last_Tcw = Tcw
        self._last_Tcw_dev = res.Tcw
        self.last_assoc = res.assoc
        self.last_inlier = res.inlier

        # sm.Tcr was computed against ref_at_track — record that same id
        # even if a new keyframe is created below / published concurrently
        if not self.localization_only and self._need_new_keyframe(sm):
            self._create_keyframe(fd, res, timestamp)

        self.trajectory.append(TrajectoryEntry(
            timestamp, sm.Tcr, ref_at_track, False))
        self.last_fd = fd
        self.frame_id += 1
        return Tcw

    def track_monocular(self, gray, timestamp: float):
        fd = self.frontend(jnp.asarray(gray, jnp.float32))
        return self._track_common(fd, timestamp)

    def _initialize_mono(self, fd, timestamp: float) -> bool:
        """MonocularInitialization (Tracking.cc:663): hold a reference
        frame, match, run the H/F initializer, build the 2-KF map, refine
        with an initial bundle adjustment (CreateInitialMapMonocular's
        20-iteration GBA, :784)."""
        if not hasattr(self, "f_mono_match"):
            (self.f_mono_match,
             self.f_mono_build) = tracking.make_mono_init_fns(self.cfg)
            self._mono_key = jax.random.PRNGKey(7)
        n_kp = int(jnp.sum(fd.valid))
        if getattr(self, "_mono_ref", None) is None:
            if n_kp > 100:
                self._mono_ref = (fd, self.frame_id, timestamp)
            return False
        ref, ref_id, ref_ts = self._mono_ref
        if n_kp <= 100:
            self._mono_ref = None   # (:688-693: drop weak reference frame)
            return False
        m, n_matches = self.f_mono_match(ref, fd)
        if int(n_matches) < 100:    # (:698)
            self._mono_ref = None
            return False
        self._mono_key, k = jax.random.split(self._mono_key)
        ms2, ok, T2, assoc_cur, n_pts = self.f_mono_build(
            self.ms, ref, fd, m, k, jnp.int32(ref_id),
            jnp.int32(self.frame_id), jnp.float32(ref_ts),
            jnp.float32(timestamp))
        if not bool(ok):
            return False
        self.ms = ms2
        self.n_kfs = 2
        self.mp_top = fd.n
        self.last_Tcw = np.asarray(T2)
        self.last_assoc = assoc_cur
        self.last_inlier = jnp.ones((fd.n,), bool)
        self.ref_kf = 1
        self.state = tracking.OK
        self.last_kf_frame_id = self.frame_id
        self.stats["kf_inserted"] += 2
        self.stats["mp_created"] += int(n_pts)
        # initial refinement (GlobalBundleAdjustemnt(20), Tracking.cc:784)
        self.ms, _ = self.f_local_ba(self.ms, jnp.int32(1))
        self.last_Tcw = np.asarray(self.ms.kf_pose[1])
        if self.loop_closer is not None:
            self.loop_closer.add_keyframe(self.ms, 0)
            self.loop_closer.add_keyframe(self.ms, 1)
        self._record_traj(timestamp, self.last_Tcw)
        self._mono_ref = None
        return True

    def current_pose_covariance(self):
        """6×6 covariance of the last tracked pose, or None."""
        if getattr(self, "last_fd", None) is None or self.last_Tcw is None:
            return None
        return np.asarray(self.f_pose_cov(
            self.ms, self.last_fd, jnp.asarray(self.last_Tcw, jnp.float32),
            self.last_assoc))

    # -------------------------------------------------------------- stages
    def _initialize(self, fd, timestamp: float) -> bool:
        if self.cfg.sensor == MONOCULAR:
            return self._initialize_mono(fd, timestamp)
        # reference requires 500 keypoints (Tracking.cc:611); we gate on
        # usable depth points, which is the binding constraint
        n_valid = int(jnp.sum((fd.depth > 0) & fd.valid))
        if n_valid < 50:
            return False
        Tcw0 = jnp.eye(4, dtype=jnp.float32)
        self.ms, assoc, n_pts = self.f_init(
            self.ms, fd, Tcw0, jnp.int32(self.frame_id),
            jnp.float32(timestamp))
        self.n_kfs = 1
        self.mp_top = fd.n            # init used slots [0, N)
        self.last_Tcw = np.eye(4, dtype=np.float32)
        self.last_assoc = assoc
        self.last_inlier = jnp.ones((fd.n,), bool)
        self.ref_kf = 0
        self.state = tracking.OK
        self.last_kf_frame_id = self.frame_id
        self.stats["kf_inserted"] += 1
        self.stats["mp_created"] += int(n_pts)
        self._record_traj(timestamp, self.last_Tcw)
        return True

    def _absorb_track_counters(self, res) -> None:
        """Fold per-frame visible/found masks into the map.  The async
        engine overrides this to accumulate instead (single-writer rule)."""
        self.ms = self.f_apply_counters(self.ms, res.visible_mask,
                                        res.found_mask)

    def _predict_pose(self) -> np.ndarray:
        if self.velocity is not None:
            return (self.velocity @ self.last_Tcw).astype(np.float32)
        return self.last_Tcw.astype(np.float32)

    def _need_new_keyframe(self, sm) -> bool:
        """NeedNewKeyFrame (Tracking.cc:1076-1160), with the synchronous-
        mapping simplification that the mapper is always idle.  All inputs
        come pre-fetched in the frame summary (no extra device reads)."""
        t = self.cfg.tracking
        max_frames = int(self.cfg.camera.fps)
        frames_since = self.frame_id - self.last_kf_frame_id
        if self.n_kfs >= self.cfg.capacity.max_keyframes - 1:
            return False
        n_inliers = sm.n_inliers_map
        ref_matches = max(
            sm.ref_tracked3 if self.n_kfs > 2 else sm.ref_tracked2, 1)
        # stereo close-point pressure (Tracking.cc:1106-1124)
        need_close = (sm.n_tracked_close < 100
                      and sm.n_nontracked_close > 70)
        th_ref_ratio = 0.75 if self.cfg.sensor != MONOCULAR else 0.9
        if self.n_kfs < 2:
            th_ref_ratio = 0.4
        c1a = frames_since >= max_frames
        c1b = frames_since >= t.min_frames        # mapper idle in sync mode
        c1c = (self.cfg.sensor != MONOCULAR
               and (n_inliers < ref_matches * 0.25 or need_close))
        c2 = ((n_inliers < ref_matches * th_ref_ratio or need_close)
              and n_inliers > 15)
        return (c1a or c1b or c1c) and c2

    def _create_keyframe(self, fd, res, timestamp: float) -> None:
        kf_slot = self.n_kfs
        self.ms, n_new = self.f_insert_kf(
            self.ms, fd, res.Tcw, res.assoc, jnp.int32(kf_slot),
            jnp.int32(self.mp_top), jnp.int32(self.ref_kf),
            jnp.int32(self.frame_id), jnp.float32(timestamp))
        n_new = int(n_new)
        self.mp_top = min(self.mp_top + n_new, self.cfg.capacity.max_map_points)
        self.n_kfs += 1
        self.ref_kf = kf_slot
        self.last_kf_frame_id = self.frame_id

        self.stats["kf_inserted"] += 1
        self.stats["mp_created"] += n_new
        # refresh tracking association so new points participate immediately
        self.last_assoc = self.ms.kf_mp[kf_slot]
        self.last_inlier = jnp.ones_like(self.last_inlier)

        # ---- local mapping (synchronous; LocalMapping::Run order:
        # cull points → triangulate → fuse → local BA → cull KFs) ----
        self.ms, n_culled = self.f_cull_mp(self.ms, jnp.int32(kf_slot))
        self.stats["mp_culled"] += int(n_culled)
        # CreateNewMapPoints: epipolar triangulation with the top covisible
        # neighbours (LocalMapping.cc:207; 10/20 there, bounded here — each
        # neighbour is a dense N×N pass)
        if self.n_kfs >= 2:
            w = np.asarray(self.f_covis_row(self.ms, jnp.int32(kf_slot)))
            for nb in np.argsort(-w)[:2]:
                if w[nb] < 15 or self.mp_top >= self.cfg.capacity.max_map_points:
                    break
                tri = self.f_triangulate(self.ms, jnp.int32(kf_slot),
                                         jnp.int32(int(nb)))
                self.ms, n_tri = self.f_insert_tri(
                    self.ms, jnp.int32(kf_slot), jnp.int32(int(nb)), tri,
                    jnp.int32(self.mp_top))
                n_tri = int(n_tri)
                self.mp_top += n_tri
                self.stats["mp_created"] += n_tri
        self.ms, n_merged = self.f_fuse(self.ms, jnp.int32(kf_slot))
        self.stats["mp_fused"] += int(n_merged)
        if self.n_kfs >= 3:
            self.ms, n_out = self.f_local_ba(self.ms, jnp.int32(kf_slot))
            self.stats["ba_outliers"] += int(n_out)
        if self.n_kfs >= 5:
            self.ms, culled = self.f_cull_kf(self.ms, jnp.int32(kf_slot))
            self.stats["kf_culled"] += int(culled)
        # associations may have been fused away — refresh from the map
        self.last_assoc = self.ms.kf_mp[kf_slot]

        # ---- loop closing (LoopClosing::Run per keyframe) ----
        if self.loop_closer is not None:
            self.loop_closer.add_keyframe(self.ms, kf_slot)
            self.ms, closed = self.loop_closer.process(self.ms, kf_slot,
                                                       self.n_kfs)
            if closed:
                self.stats["loops_closed"] += 1
                # poses moved wholesale — rebase the motion model
                self.velocity = None
                self.last_Tcw = np.asarray(self.ms.kf_pose[kf_slot])

    def _handle_lost(self, fd, timestamp: float) -> Optional[np.ndarray]:
        """Relocalization path (Tracking.cc:434-449)."""
        if self.loop_closer is None:
            self._record_traj(timestamp, None)
            self.frame_id += 1
            return None
        Tcw, assoc = self.loop_closer.relocalize(self.ms, fd)
        self.frame_id += 1
        if Tcw is None:
            self._record_traj(timestamp, None)
            return None
        self.stats["reloc"] += 1
        self.state = tracking.OK
        self.velocity = None
        self.last_Tcw = Tcw.astype(np.float32)
        self.last_assoc = assoc
        self.last_inlier = jnp.ones_like(assoc >= 0)
        self._record_traj(timestamp, Tcw)
        return Tcw

    def _record_traj(self, timestamp: float, Tcw: Optional[np.ndarray]):
        if Tcw is None:
            self.trajectory.append(TrajectoryEntry(
                timestamp, np.eye(4, dtype=np.float32), self.ref_kf, True))
            return
        Tref = np.asarray(self.ms.kf_pose[self.ref_kf])
        Tcr = Tcw @ np.linalg.inv(Tref)
        self.trajectory.append(TrajectoryEntry(
            timestamp, Tcr.astype(np.float32), self.ref_kf, False))

    # ------------------------------------------------------------- outputs
    def frame_poses(self) -> List[Optional[np.ndarray]]:
        """Reconstruct per-frame camera poses Tcw through the (possibly
        BA-corrected) reference keyframes (System::SaveTrajectoryTUM,
        System.cc:478-503)."""
        kf_pose = np.asarray(self.ms.kf_pose)
        out = []
        for e in self.trajectory:
            if e.lost:
                out.append(None)
            else:
                out.append(e.Tcr @ kf_pose[e.ref_kf])
        return out

    def map_points(self) -> np.ndarray:
        """Live map-point cloud (System::GetMap, System.cc:793)."""
        pos = np.asarray(self.ms.mp_pos)
        valid = np.asarray(self.ms.mp_valid)
        return pos[valid]
