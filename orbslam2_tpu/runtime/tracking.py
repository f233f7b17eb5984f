"""Per-frame tracking: the state machine of ``Tracking`` (src/Tracking.cc).

Architecture split (SURVEY.md §7 "hard parts"): everything numeric is a
handful of jitted step functions over (MapState, FrameData); the
data-dependent control flow — state machine, motion-model fallback,
keyframe decision — stays on the host and only reads back a few scalars.

Jitted steps:
  * init_stereo     — StereoInitialization (Tracking.cc:609)
  * track           — TrackWithMotionModel + TrackLocalMap fused
                      (Tracking.cc:967,1030): two projection-matching +
                      pose-optimization stages in one compiled program
  * track_ref_kf    — TrackReferenceKeyFrame fallback (Tracking.cc:855)
  * insert_keyframe — CreateNewKeyFrame incl. close-point creation
                      (Tracking.cc:1162)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.config import MONOCULAR, SlamConfig
from orbslam2_tpu.models import map_state as M
from orbslam2_tpu.models.frame import FrameData
from orbslam2_tpu.ops import matching, pose_opt
from orbslam2_tpu.utils import camera as cam_mod
from orbslam2_tpu.utils import lie

# Tracking states (Tracking.h:82-88)
SYSTEM_NOT_READY = -1
NO_IMAGES_YET = 0
NOT_INITIALIZED = 1
OK = 2
LOST = 3


class TrackResult(NamedTuple):
    """Everything the host state machine needs, with all scalars packed
    into ONE flat vector: a device→host fetch costs a full tunnel round
    trip (~tens of ms on remote-attached TPUs), so the per-frame contract
    is exactly one small transfer (``summary``), with the big arrays
    (assoc/inlier/masks) staying resident on device."""

    Tcw: jax.Array         # [4,4] device copy (feeds the next track call)
    assoc: jax.Array       # [N] feature → map-point id (−1 none)
    inlier: jax.Array      # [N] bool pose-opt inliers
    summary: jax.Array     # [40] f32, see SUMMARY_* layout below
    visible_mask: jax.Array        # [P] frustum-visible live points
    found_mask: jax.Array          # [P] matched-inlier points

    # summary layout
    # [0:16]  Tcw row-major
    # [16:32] Tcr = Tcw · kf_pose[ref]⁻¹ row-major (trajectory record)
    # [32] n_matches_mm   [33] n_inliers_mm   [34] n_inliers_map
    # [35] n_tracked_close  [36] n_nontracked_close
    # [37] ref_tracked(minObs=2)  [38] ref_tracked(minObs=3)  [39] pad


def pack_summary(Tcw, Tcr, scalars) -> jax.Array:
    flat = [Tcw.reshape(16), Tcr.reshape(16),
            jnp.stack([jnp.asarray(x, jnp.float32) for x in scalars])]
    v = jnp.concatenate(flat)
    return jnp.pad(v, (0, 40 - v.shape[0]))


class Summary:
    """Host-side view over the fetched summary vector."""

    def __init__(self, vec: np.ndarray):
        self.Tcw = np.asarray(vec[0:16], np.float32).reshape(4, 4)
        self.Tcr = np.asarray(vec[16:32], np.float32).reshape(4, 4)
        self.n_matches_mm = int(vec[32])
        self.n_inliers_mm = int(vec[33])
        self.n_inliers_map = int(vec[34])
        self.n_tracked_close = int(vec[35])
        self.n_nontracked_close = int(vec[36])
        self.ref_tracked2 = int(vec[37])
        self.ref_tracked3 = int(vec[38])
        # localization-mode VO only: inlier matches to real map points
        # (mbVO criterion, Tracking.cc:1019-1022); 0 elsewhere
        self.n_real_mm = int(vec[39])


def _sigma2_table(cfg: SlamConfig) -> np.ndarray:
    s = np.array([cfg.orb.scale_factor ** (2 * l)
                  for l in range(cfg.orb.n_levels)], np.float32)
    return s


def _assoc_from_query_match(match: jax.Array, mp_ids: jax.Array, n_kp: int
                            ) -> jax.Array:
    """Query-row→kp matches into a per-keypoint assoc array [N]."""
    tgt = jnp.where(match >= 0, match, n_kp)
    assoc = jnp.full((n_kp + 1,), M.NO_MP, jnp.int32)
    assoc = assoc.at[tgt].set(jnp.where(match >= 0, mp_ids, M.NO_MP))
    return assoc[:n_kp]


def _pose_obs_from_assoc(ms: M.MapState, fd: FrameData, assoc: jax.Array,
                         inv_sigma2_of_level) -> pose_opt.PoseObs:
    ok = assoc >= 0
    idx = jnp.where(ok, assoc, 0)
    return pose_opt.PoseObs(
        pts_w=ms.mp_pos[idx],
        uv=fd.xy,
        ur=fd.ur,
        inv_sigma2=jnp.asarray(inv_sigma2_of_level)[fd.level],
        valid=ok & ms.mp_valid[idx] & fd.valid)


def make_tracking_fns(cfg: SlamConfig):
    """Build the jitted tracking step functions for a given config."""
    cam = cam_mod.Camera.from_config(cfg.camera)
    # numpy, not device arrays: these are captured as jit closure constants
    # (see Camera.from_config for the runtime-poisoning rationale)
    sigma2 = _sigma2_table(cfg)
    inv_sigma2 = (1.0 / sigma2).astype(np.float32)
    sf, nl = cfg.orb.scale_factor, cfg.orb.n_levels
    tcfg = cfg.tracking
    depth_cutoff = cfg.camera.baseline * cfg.camera.th_depth \
        if cfg.camera.bf > 0 else float("inf")
    N = cfg.orb.n_features_padded
    mm_radius = (tcfg.stereo_searching_radius if cfg.sensor != MONOCULAR
                 else tcfg.searching_radius)

    # ---------------------------------------------------------------- init
    @jax.jit
    def init_stereo(ms: M.MapState, fd: FrameData, Tcw: jax.Array,
                    frame_id: jax.Array, timestamp: jax.Array
                    ) -> Tuple[M.MapState, jax.Array, jax.Array]:
        """StereoInitialization (Tracking.cc:609): KF0 + a map point for
        every feature with positive depth.  Returns (ms, assoc, n_points)."""
        ok = fd.valid & (fd.depth > 0)
        slots, ok = M.alloc_mp_slots(ms, ok)
        pos_c = cam_mod.backproject(cam, fd.xy, fd.depth)
        Twc = lie.se3_inv(Tcw)
        pos_w = lie.transform_points(Twc, pos_c)
        ms = M.add_map_points(ms, slots, pos_w, ok,
                              ref_kf=jnp.zeros((N,), jnp.int32))
        assoc = jnp.where(ok, slots, M.NO_MP)
        ms = M.add_keyframe(
            ms, jnp.int32(0), Tcw, frame_id, timestamp, fd.xy, fd.level,
            fd.angle, fd.desc, fd.valid, fd.ur, fd.depth, assoc,
            parent=jnp.int32(-1))
        feat_idx = jnp.arange(N, dtype=jnp.int32)
        ms = M.add_observations(ms, jnp.int32(0), feat_idx, assoc, ok, sf, nl)
        return ms, assoc, jnp.sum(ok.astype(jnp.int32))

    # --------------------------------------------------------------- track
    def _ref_tracked(ms, ref_kf, min_obs):
        mp = ms.kf_mp[ref_kf]
        okk = (mp >= 0) & ms.kf_kp_valid[ref_kf]
        idxk = jnp.where(okk, mp, 0)
        good = okk & ms.mp_valid[idxk] & (ms.mp_n_obs[idxk] >= min_obs)
        return jnp.sum(good.astype(jnp.int32))

    def _stage1(ms: M.MapState, fd: FrameData, Tcw_pred, last_assoc,
                last_ok, wide_scale):
        """TrackWithMotionModel (Tracking.cc:967): project last frame's map
        points into the current frame, match, pose-optimize.
        ``wide_scale`` is a traced scalar (1.0 or 2.0 — the ×2 widened
        retry of Tracking.cc:985 runs as a lax.cond branch, not a second
        host dispatch)."""
        lq_ok = (last_assoc >= 0) & last_ok
        idx = jnp.where(lq_ok, last_assoc, 0)
        normals = ms.mp_normal()
        q1 = matching.ProjectionQuery(
            pos_w=ms.mp_pos[idx], normal=normals[idx],
            min_dist=ms.mp_min_dist[idx],
            max_dist=ms.mp_max_dist[idx],
            desc=ms.mp_desc[idx], valid=lq_ok & ms.mp_valid[idx])
        r1 = mm_radius * wide_scale
        m1, d1, _ = matching.search_by_projection(
            cam, Tcw_pred, q1, fd.xy, fd.level, fd.desc, fd.valid, fd.ur,
            sf, nl, radius=r1, nn_ratio=tcfg.motion_model_nn_ratio,
            view_cos_limit=-1.0, check_ur=True)
        m1 = matching.resolve_duplicates(m1, d1, N)
        n_mm_matches = jnp.sum((m1 >= 0).astype(jnp.int32))
        assoc1 = _assoc_from_query_match(m1, last_assoc, N)

        obs1 = _pose_obs_from_assoc(ms, fd, assoc1, inv_sigma2)
        pose1, inl1, n1 = pose_opt.pose_optimization(
            cam, Tcw_pred, obs1, n_rounds=4, iters_per_round=10)
        return pose1, assoc1, n_mm_matches, n1

    C = None  # filled below: compacted stage-2 candidate count

    def _stage2(ms: M.MapState, fd: FrameData, pose1, assoc1, ref_kf,
                n_mm_matches, n1):
        """TrackLocalMap (Tracking.cc:1030).  The local map is the points
        of keyframes sharing observations with the current matches, capped
        at keyframesLimit=80 (Tracking.cc:1294-1438).  This restriction is
        not just a CPU working-set bound: matching against far-away map
        regions would close loops silently through tracking and starve the
        explicit loop-closing path (and is unsafe under drift).

        TPU shape discipline: local-KF selection is a [K, N] gather
        (kf_share_counts) and candidate points are compacted to a top-C
        set before the Hamming matrix — never a [K, P] incidence build or
        a [P, N] distance matrix (VERDICT r2 weak #3)."""
        Cc = min(cfg.capacity.track_candidates, ms.P)
        matched_mask = jnp.zeros((ms.P,), bool).at[
            jnp.where(assoc1 >= 0, assoc1, ms.P)].set(True)
        share = M.kf_share_counts(ms, matched_mask)            # [K]
        kcap = min(tcfg.keyframes_limit, ms.K)
        topw, topi = jax.lax.top_k(share, kcap)
        local_kf = jnp.zeros((ms.K,), bool).at[
            jnp.where(topw > 0, topi, ms.K)].set(True)
        local_pt = M.points_of_kfs(ms, local_kf)
        # candidate compaction: local, live, in-frustum, not already
        # matched this frame (SearchLocalPoints skips mnLastFrameSeen
        # points, Tracking.cc:1252-1261)
        normals = ms.mp_normal()
        vis_all, _, _, _, _ = cam_mod.in_frustum(
            cam, pose1, ms.mp_pos, 0.8 * ms.mp_min_dist,
            1.2 * ms.mp_max_dist, normals)
        cand = local_pt & ms.mp_valid & vis_all & (~matched_mask)
        ids, sel_ok = M.compact_mask(cand, Cc)                 # [C]
        q2 = matching.ProjectionQuery(
            pos_w=ms.mp_pos[ids], normal=normals[ids],
            min_dist=ms.mp_min_dist[ids],
            max_dist=ms.mp_max_dist[ids],
            desc=ms.mp_desc[ids], valid=sel_ok)
        m2, d2, _ = matching.search_by_projection(
            cam, pose1, q2, fd.xy, fd.level, fd.desc, fd.valid, fd.ur,
            sf, nl, radius=4.0 * tcfg.searching_by_projection_threshold / 5.0,
            nn_ratio=tcfg.search_local_points_nn_ratio)
        m2 = matching.resolve_duplicates(m2, d2, N)
        assoc2 = _assoc_from_query_match(m2, ids, N)
        assoc = jnp.where(assoc1 >= 0, assoc1, assoc2)

        obs2 = _pose_obs_from_assoc(ms, fd, assoc, inv_sigma2)
        pose2, inl2, n2 = pose_opt.pose_optimization(
            cam, pose1, obs2, n_rounds=4, iters_per_round=10)

        # ---- visibility / found statistics (MapPoint::IncreaseVisible /
        # IncreaseFound, Tracking.cc:1242-1291 + 1050-1060) — returned as
        # masks so the map update can be applied synchronously or batched
        # by the async mapping worker ----
        visible, _, _, _, _ = cam_mod.in_frustum(
            cam, pose2, ms.mp_pos, 0.8 * ms.mp_min_dist,
            1.2 * ms.mp_max_dist, normals)
        visible_mask = visible & ms.mp_valid
        found_ok = (assoc >= 0) & inl2
        found_mask = jnp.zeros((ms.P,), bool).at[
            jnp.where(found_ok, assoc, ms.P)].set(True)

        assoc_final = jnp.where(inl2, assoc, M.NO_MP)
        # close-point bookkeeping for NeedNewKeyFrame c1c (Tracking.cc:1106-1124)
        close = fd.valid & (fd.depth > 0) & (fd.depth < depth_cutoff)
        tracked_close = jnp.sum((close & (assoc_final >= 0)).astype(jnp.int32))
        nontracked_close = jnp.sum((close & (assoc_final < 0)).astype(jnp.int32))
        Tcr = pose2 @ lie.se3_inv(ms.kf_pose[ref_kf])
        summary = pack_summary(pose2, Tcr, [
            n_mm_matches, n1, n2, tracked_close, nontracked_close,
            _ref_tracked(ms, ref_kf, 2), _ref_tracked(ms, ref_kf, 3), 0])
        return TrackResult(Tcw=pose2, assoc=assoc_final, inlier=inl2,
                           summary=summary,
                           visible_mask=visible_mask, found_mask=found_mask)

    def track_body(ms: M.MapState, fd: FrameData, Tcw_pred: jax.Array,
                   last_assoc: jax.Array, last_ok: jax.Array,
                   ref_kf: jax.Array, widen_in_device: bool = True,
                   wide: bool = False) -> TrackResult:
        if wide:
            s1 = _stage1(ms, fd, Tcw_pred, last_assoc, last_ok,
                         jnp.float32(2.0))
        else:
            s1 = _stage1(ms, fd, Tcw_pred, last_assoc, last_ok,
                         jnp.float32(1.0))
            if widen_in_device:
                # widen ×2 when the narrow pass is weak (Tracking.cc:985-996)
                # — a lax.cond branch instead of a second host dispatch
                pose1, assoc1, n_mm, n1 = s1
                need_wide = ((n_mm < tcfg.speedup_matches_threshold)
                             | (n1 < tcfg.motion_model_threshold))
                s1 = jax.lax.cond(
                    need_wide,
                    lambda: _stage1(ms, fd, Tcw_pred, last_assoc, last_ok,
                                    jnp.float32(2.0)),
                    lambda: s1)
        pose1, assoc1, n_mm, n1 = s1
        return _stage2(ms, fd, pose1, assoc1, ref_kf, n_mm, n1)

    @functools.partial(jax.jit, static_argnames=("wide",))
    def track(ms: M.MapState, fd: FrameData, Tcw_pred: jax.Array,
              last_assoc: jax.Array, last_ok: jax.Array,
              ref_kf: jax.Array, wide: bool = False) -> TrackResult:
        return track_body(ms, fd, Tcw_pred, last_assoc, last_ok, ref_kf,
                          widen_in_device=False, wide=wide)

    # ------------------------------------------- localization-mode VO track
    def track_loc_body(ms: M.MapState, fd: FrameData, prev_fd: FrameData,
                       prev_Tcw: jax.Array, Tcw_pred: jax.Array,
                       last_assoc: jax.Array, last_ok: jax.Array,
                       ref_kf: jax.Array) -> TrackResult:
        """Localization-mode tracking with temporal visual-odometry points
        (UpdateLastFrame, Tracking.cc:901-965 + the mbVO dual path,
        :393-520): the previous frame's stereo/RGB-D depth spawns one-shot
        VO landmarks that join the motion-model matching stage, so the
        camera keeps tracking through map-coverage holes.  The mbVO
        decision datum (matches to REAL map points with ≥1 observation)
        is returned in summary slot 39; when it is < 10 the device keeps
        the stage-1 (VO) pose — TrackLocalMap is skipped exactly as the
        reference skips it in VO mode (:503-508)."""
        # ---- temporal VO points from the previous frame's depth ----
        can = prev_fd.valid & (prev_fd.depth > 0)
        close = can & (prev_fd.depth <= depth_cutoff)
        order = jnp.argsort(jnp.where(can, prev_fd.depth, jnp.inf))
        rank_of = jnp.zeros((N,), jnp.int32).at[order].set(
            jnp.arange(N, dtype=jnp.int32))
        keep = can & (close | (rank_of < tcfg.points_closer_threshold))
        la_ok = last_assoc >= 0
        la_safe = jnp.where(la_ok, last_assoc, 0)
        has_mp = la_ok & ms.mp_valid[la_safe] & (ms.mp_n_obs[la_safe] >= 1)
        vo_valid = keep & (~has_mp)
        pos_c = cam_mod.backproject(cam, prev_fd.xy, prev_fd.depth)
        Twc_prev = lie.se3_inv(prev_Tcw)
        vo_pos = lie.transform_points(Twc_prev, pos_c)
        dist = jnp.linalg.norm(pos_c, axis=-1)
        ray_w = vo_pos - Twc_prev[:3, 3]
        vo_normal = ray_w / jnp.maximum(
            jnp.linalg.norm(ray_w, axis=-1, keepdims=True), 1e-9)

        # ---- stage 1 over the union query (map points ∪ VO points) ----
        lq_ok = la_ok & last_ok
        idx = jnp.where(lq_ok, last_assoc, 0)
        normals = ms.mp_normal()
        q_union = matching.ProjectionQuery(
            pos_w=jnp.concatenate([ms.mp_pos[idx], vo_pos]),
            normal=jnp.concatenate([normals[idx], vo_normal]),
            min_dist=jnp.concatenate([ms.mp_min_dist[idx], 0.5 * dist]),
            max_dist=jnp.concatenate([ms.mp_max_dist[idx], 2.0 * dist]),
            desc=jnp.concatenate([ms.mp_desc[idx], prev_fd.desc]),
            valid=jnp.concatenate([lq_ok & ms.mp_valid[idx], vo_valid]))
        m1, d1, _ = matching.search_by_projection(
            cam, Tcw_pred, q_union, fd.xy, fd.level, fd.desc, fd.valid,
            fd.ur, sf, nl, radius=mm_radius,
            nn_ratio=tcfg.motion_model_nn_ratio,
            view_cos_limit=-1.0, check_ur=True)
        m1 = matching.resolve_duplicates(m1, d1, N)
        n_mm = jnp.sum((m1 >= 0).astype(jnp.int32))
        # union ids: real map id for rows < N, P + feature-idx for VO rows
        union_ids = jnp.concatenate([
            last_assoc, ms.P + jnp.arange(N, dtype=jnp.int32)])
        assoc_u = _assoc_from_query_match(m1, union_ids, N)
        is_real = (assoc_u >= 0) & (assoc_u < ms.P)
        real_safe = jnp.where(is_real, assoc_u, 0)
        pts_w = jnp.where(is_real[:, None], ms.mp_pos[real_safe],
                          vo_pos[jnp.clip(assoc_u - ms.P, 0, N - 1)])
        obs1 = pose_opt.PoseObs(
            pts_w=pts_w, uv=fd.xy, ur=fd.ur,
            inv_sigma2=jnp.asarray(inv_sigma2)[fd.level],
            valid=(assoc_u >= 0) & fd.valid)
        pose1, inl1, n1 = pose_opt.pose_optimization(
            cam, Tcw_pred, obs1, n_rounds=4, iters_per_round=10)
        # mbVO criterion: inlier matches to real map points with ≥1 obs
        n_real = jnp.sum((is_real & inl1
                          & (ms.mp_n_obs[real_safe] >= 1)).astype(jnp.int32))
        vo_mode = n_real < 10

        # ---- stage 2 on real map points (skipped in VO mode) ----
        assoc1 = jnp.where(is_real & inl1, assoc_u, M.NO_MP)
        res2 = _stage2(ms, fd, pose1, assoc1, ref_kf, n_mm, n1)
        pose_final = jnp.where(vo_mode, pose1, res2.Tcw)
        assoc_final = jnp.where(vo_mode, assoc1, res2.assoc)
        inlier = jnp.where(vo_mode, inl1, res2.inlier)
        Tcr = pose_final @ lie.se3_inv(ms.kf_pose[ref_kf])
        close_f = fd.valid & (fd.depth > 0) & (fd.depth < depth_cutoff)
        tracked_close = jnp.sum(
            (close_f & (assoc_final >= 0)).astype(jnp.int32))
        nontracked_close = jnp.sum(
            (close_f & (assoc_final < 0)).astype(jnp.int32))
        summary = pack_summary(pose_final, Tcr, [
            n_mm, n1, res2.summary[34], tracked_close, nontracked_close,
            _ref_tracked(ms, ref_kf, 2), _ref_tracked(ms, ref_kf, 3),
            n_real])
        return TrackResult(Tcw=pose_final, assoc=assoc_final, inlier=inlier,
                           summary=summary,
                           visible_mask=res2.visible_mask,
                           found_mask=res2.found_mask)

    # ------------------------------------------------ reference-KF fallback
    @jax.jit
    def track_ref_kf(ms: M.MapState, fd: FrameData, ref_kf: jax.Array,
                     Tcw_init: jax.Array) -> TrackResult:  # noqa: D401
        """TrackReferenceKeyFrame (Tracking.cc:855): descriptor matching
        against one keyframe (brute-force replaces SearchByFboW) + pose opt
        from the last frame's pose."""
        kdesc = ms.kf_desc[ref_kf]
        kvalid = ms.kf_kp_valid[ref_kf] & (ms.kf_mp[ref_kf] >= 0)
        m, d = matching.match_descriptors(
            fd.desc, fd.valid, kdesc, kvalid,
            nn_ratio=tcfg.reference_keyframe_nn_ratio, th=matching.TH_LOW,
            angle_a=fd.angle, angle_b=ms.kf_angle[ref_kf])
        assoc = jnp.where(m >= 0, ms.kf_mp[ref_kf][jnp.where(m >= 0, m, 0)],
                          M.NO_MP)
        obs = _pose_obs_from_assoc(ms, fd, assoc, inv_sigma2)
        pose, inl, n = pose_opt.pose_optimization(cam, Tcw_init, obs)
        n_matches = jnp.sum((assoc >= 0).astype(jnp.int32))
        assoc_final = jnp.where(inl, assoc, M.NO_MP)
        close = fd.valid & (fd.depth > 0) & (fd.depth < depth_cutoff)
        tracked_close = jnp.sum((close & (assoc_final >= 0)).astype(jnp.int32))
        nontracked_close = jnp.sum((close & (assoc_final < 0)).astype(jnp.int32))
        nofp = jnp.zeros((ms.P,), bool)
        Tcr = pose @ lie.se3_inv(ms.kf_pose[ref_kf])
        summary = pack_summary(pose, Tcr, [
            n_matches, n, n, tracked_close, nontracked_close,
            _ref_tracked(ms, ref_kf, 2), _ref_tracked(ms, ref_kf, 3), 0])
        return TrackResult(Tcw=pose, assoc=assoc_final, inlier=inl,
                           summary=summary,
                           visible_mask=nofp, found_mask=nofp)

    # ------------------------------------------------------ keyframe insert
    def insert_keyframe_body(ms: M.MapState, fd: FrameData, Tcw: jax.Array,
                             assoc: jax.Array, kf_slot: jax.Array,
                             kf_ordinal: jax.Array, parent: jax.Array,
                             frame_id: jax.Array, timestamp: jax.Array
                             ) -> Tuple[M.MapState, jax.Array]:
        """CreateNewKeyFrame (Tracking.cc:1162): write the KF, record
        existing associations, create new map points from close stereo
        depth for unmatched features.  ``kf_ordinal`` is the monotonic
        insertion counter (slot ids are reused after culling)."""
        # drop associations to points culled between track time and
        # (possibly queued, async) insertion time
        assoc = jnp.where(ms.mp_valid[jnp.where(assoc >= 0, assoc, 0)]
                          & (assoc >= 0), assoc, M.NO_MP)
        # new close points: unmatched, depth ∈ (0, cutoff]; if fewer than
        # newKeyframeThreshold close ones exist, take the nearest 100
        # regardless of cutoff (Tracking.cc:1188-1219 semantics)
        can = fd.valid & (fd.depth > 0) & (assoc < 0)
        close = can & (fd.depth <= depth_cutoff)
        n_close = jnp.sum(close.astype(jnp.int32))
        depth_rank = jnp.argsort(jnp.where(can, fd.depth, jnp.inf))
        rank_of = jnp.zeros((N,), jnp.int32).at[depth_rank].set(
            jnp.arange(N, dtype=jnp.int32))
        need_fill = n_close < tcfg.new_keyframe_threshold
        ok_new = jnp.where(need_fill,
                           can & (rank_of < tcfg.new_keyframe_threshold),
                           close)
        slots, ok_new = M.alloc_mp_slots(ms, ok_new)

        pos_c = cam_mod.backproject(cam, fd.xy, fd.depth)
        pos_w = lie.transform_points(lie.se3_inv(Tcw), pos_c)
        ms = M.add_map_points(ms, slots, pos_w, ok_new,
                              ref_kf=jnp.full((N,), kf_slot, jnp.int32),
                              first_kf=jnp.full((N,), kf_ordinal, jnp.int32))
        assoc_full = jnp.where(ok_new, slots, assoc)

        ms = M.add_keyframe(ms, kf_slot, Tcw, frame_id, timestamp, fd.xy,
                            fd.level, fd.angle, fd.desc, fd.valid, fd.ur,
                            fd.depth, assoc_full, parent)
        feat_idx = jnp.arange(N, dtype=jnp.int32)
        obs_ok = assoc_full >= 0
        ms = M.add_observations(ms, kf_slot, feat_idx, assoc_full, obs_ok,
                                sf, nl)
        return ms, jnp.sum(ok_new.astype(jnp.int32))

    insert_keyframe = jax.jit(insert_keyframe_body)

    @jax.jit
    def apply_counters(ms: M.MapState, visible_mask: jax.Array,
                       found_mask: jax.Array) -> M.MapState:
        """Fold per-frame visible/found masks into the map counters."""
        return ms._replace(
            mp_visible=ms.mp_visible + visible_mask.astype(jnp.int32),
            mp_found=ms.mp_found + found_mask.astype(jnp.int32))

    @jax.jit
    def pose_covariance(ms: M.MapState, fd: FrameData, Tcw: jax.Array,
                        assoc: jax.Array) -> jax.Array:
        """6×6 pose covariance = inverse GN Hessian of the reprojection
        problem at the current pose (System::GetCurrentCovarianceMatrix,
        System.cc:703-790 — Geneva/Eckenhoff/Huang App. F formulation)."""
        obs = _pose_obs_from_assoc(ms, fd, assoc, inv_sigma2)
        e, J, is_stereo, behind = pose_opt._residuals_jac(cam, Tcw, obs)
        w = obs.inv_sigma2 * obs.valid.astype(jnp.float32) \
            * (~behind).astype(jnp.float32)
        Jw = J * w[:, None, None]
        H = jnp.einsum("nij,nik->jk", Jw, J)
        return jnp.linalg.inv(H + 1e-9 * jnp.eye(6, dtype=H.dtype))

    @jax.jit
    def ref_tracked_count(ms: M.MapState, ref_kf: jax.Array,
                          min_obs: jax.Array) -> jax.Array:
        """KeyFrame::TrackedMapPoints(minObs) (KeyFrame.cc analogue): ref-KF
        features whose map point has ≥ min_obs observations."""
        mp = ms.kf_mp[ref_kf]
        ok = (mp >= 0) & ms.kf_kp_valid[ref_kf]
        idx = jnp.where(ok, mp, 0)
        good = ok & ms.mp_valid[idx] & (ms.mp_n_obs[idx] >= min_obs)
        return jnp.sum(good.astype(jnp.int32))

    return TrackingFns(
        init_stereo=init_stereo, track=track, track_ref_kf=track_ref_kf,
        insert_keyframe=insert_keyframe, ref_tracked_count=ref_tracked_count,
        pose_covariance=pose_covariance, apply_counters=apply_counters,
        track_body=track_body, insert_keyframe_body=insert_keyframe_body,
        track_loc_body=track_loc_body)


class TrackingFns(NamedTuple):
    """Jitted tracking step functions (first 7 fields keep the historic
    positional order) plus un-jitted bodies for fusion into bigger
    programs."""

    init_stereo: object
    track: object
    track_ref_kf: object
    insert_keyframe: object
    ref_tracked_count: object
    pose_covariance: object
    apply_counters: object
    track_body: object
    insert_keyframe_body: object
    track_loc_body: object


def make_fused_track_fn(cfg: SlamConfig):
    """ONE jitted program for the whole per-frame SLAM-mode hot path:
    uint8 upload → frontend (pyramid/FAST/BRIEF/stereo) → motion-model
    matching + pose opt (with the in-device ×2 widen retry) → local-map
    matching + pose opt → visible/found counter fold.

    Rationale: on a remote-attached TPU every dispatch/fetch costs a
    tunnel round trip (~25 ms measured, runtime/streaming.py header), so
    the per-frame contract must be exactly one H2D (flat uint8 frame
    payload), one dispatch, one small D2H (the 40-float summary).  This is
    the SLAM-mode equivalent of the streaming LOC window — but windowless,
    because the keyframe decision is per-frame.

    Returns track_frame(ms, payload, Tcw_pred, last_assoc, last_ok,
    ref_kf) → (ms_with_counters, fd, TrackResult).  The async engine
    discards ms_with_counters (single-writer rule) and accumulates
    res.visible/found masks instead.
    """
    from orbslam2_tpu.config import RGBD, STEREO
    from orbslam2_tpu.models import frame as frame_mod

    fns = make_tracking_fns(cfg)
    H, W = cfg.camera.height, cfg.camera.width
    if cfg.sensor == STEREO:
        frontend = frame_mod.make_frontend_stereo(cfg)

        def decode(payload):
            imgs = payload.reshape(2, H, W).astype(jnp.float32)
            return frontend(imgs[0], imgs[1])
    elif cfg.sensor == RGBD:
        frontend = frame_mod.make_frontend_rgbd(cfg)

        def decode(payload):
            gray_u8, depth = payload
            return frontend(gray_u8.reshape(H, W).astype(jnp.float32),
                            depth.reshape(H, W))
    else:
        frontend = frame_mod.make_frontend_mono(cfg)

        def decode(payload):
            return frontend(payload.reshape(H, W).astype(jnp.float32))

    @jax.jit
    def track_frame(ms: M.MapState, payload, Tcw_pred: jax.Array,
                    last_assoc: jax.Array, last_ok: jax.Array,
                    ref_kf: jax.Array):
        fd = decode(payload)
        res = fns.track_body(ms, fd, Tcw_pred, last_assoc, last_ok, ref_kf,
                             widen_in_device=True)
        ms2 = ms._replace(
            mp_visible=ms.mp_visible + res.visible_mask.astype(jnp.int32),
            mp_found=ms.mp_found + res.found_mask.astype(jnp.int32))
        return ms2, fd, res

    @jax.jit
    def track_frame_loc(ms: M.MapState, payload, prev_fd, prev_Tcw,
                        Tcw_pred: jax.Array, last_assoc: jax.Array,
                        last_ok: jax.Array, ref_kf: jax.Array):
        """Localization-mode variant with temporal VO points (mbVO path)."""
        fd = decode(payload)
        res = fns.track_loc_body(ms, fd, prev_fd, prev_Tcw, Tcw_pred,
                                 last_assoc, last_ok, ref_kf)
        ms2 = ms._replace(
            mp_visible=ms.mp_visible + res.visible_mask.astype(jnp.int32),
            mp_found=ms.mp_found + res.found_mask.astype(jnp.int32))
        return ms2, fd, res

    return track_frame, track_frame_loc


def make_mono_init_fns(cfg: SlamConfig):
    """Monocular bootstrap (Tracking::MonocularInitialization, Tracking.cc:663
    + CreateInitialMapMonocular, :736)."""
    from orbslam2_tpu.ops import initializer as init_mod

    cam = cam_mod.Camera.from_config(cfg.camera)
    sf, nl = cfg.orb.scale_factor, cfg.orb.n_levels
    N = cfg.orb.n_features_padded

    @jax.jit
    def mono_match(ref: FrameData, cur: FrameData):
        m, d = matching.search_for_initialization(
            ref.xy, ref.desc, ref.valid, ref.level,
            cur.xy, cur.desc, cur.valid, cur.level,
            ref.angle, cur.angle, window=100.0, nn_ratio=0.9)
        return m, jnp.sum((m >= 0).astype(jnp.int32))

    @jax.jit
    def mono_build(ms: M.MapState, ref: FrameData, cur: FrameData,
                   m: jax.Array, key: jax.Array,
                   frame_id_ref: jax.Array, frame_id_cur: jax.Array,
                   ts_ref: jax.Array, ts_cur: jax.Array):
        """Run H/F init and, if successful, build the two-keyframe map with
        median-depth scale normalization (Tracking.cc:786-811).
        Returns (ms, ok, Tcw2, assoc_cur, n_points)."""
        ok_m = m >= 0
        msafe = jnp.where(ok_m, m, 0)
        p1 = ref.xy
        p2 = cur.xy[msafe]
        res = init_mod.initialize_mono(cam, p1, p2, ok_m, key)

        # median-depth normalization
        z = res.points[:, 2]
        zs = jnp.where(res.good, z, jnp.nan)
        med = jnp.nanmedian(zs)
        scale = 1.0 / jnp.maximum(jnp.where(jnp.isnan(med), 1.0, med), 1e-6)
        pts = res.points * scale
        T2 = res.Tcw2.at[:3, 3].multiply(scale)

        good = res.good & res.ok
        slots = jnp.cumsum(good.astype(jnp.int32)) - 1
        slots = jnp.where(good, slots, 0).astype(jnp.int32)
        ms = M.add_map_points(ms, slots, pts, good,
                              ref_kf=jnp.zeros((N,), jnp.int32))
        assoc_ref = jnp.where(good, slots, M.NO_MP)
        # KF0 at identity
        eye = jnp.eye(4, dtype=jnp.float32)
        ms = M.add_keyframe(ms, jnp.int32(0), eye, frame_id_ref, ts_ref,
                            ref.xy, ref.level, ref.angle, ref.desc,
                            ref.valid, ref.ur, ref.depth, assoc_ref,
                            parent=jnp.int32(-1))
        feat_idx = jnp.arange(N, dtype=jnp.int32)
        ms = M.add_observations(ms, jnp.int32(0), feat_idx, assoc_ref, good,
                                sf, nl)
        # KF1: scatter assoc through the match indices
        assoc_cur = jnp.full((N + 1,), M.NO_MP, jnp.int32).at[
            jnp.where(good, msafe, N)].set(assoc_ref)[:N]
        ms = M.add_keyframe(ms, jnp.int32(1), T2, frame_id_cur, ts_cur,
                            cur.xy, cur.level, cur.angle, cur.desc,
                            cur.valid, cur.ur, cur.depth, assoc_cur,
                            parent=jnp.int32(0))
        ms = M.add_observations(ms, jnp.int32(1), feat_idx, assoc_cur,
                                assoc_cur >= 0, sf, nl)
        n_pts = jnp.sum(good.astype(jnp.int32))
        return ms, res.ok & (n_pts > 0), T2, assoc_cur, n_pts

    return mono_match, mono_build
