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
        slots = jnp.cumsum(ok.astype(jnp.int32)) - 1        # 0..n-1
        slots = jnp.where(ok, slots, 0).astype(jnp.int32)
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

    @functools.partial(jax.jit, static_argnames=("wide",))
    def track(ms: M.MapState, fd: FrameData, Tcw_pred: jax.Array,
              last_assoc: jax.Array, last_ok: jax.Array,
              ref_kf: jax.Array, wide: bool = False) -> TrackResult:
        # ---- stage 1: motion model vs last frame's map points ----
        lq_ok = (last_assoc >= 0) & last_ok
        idx = jnp.where(lq_ok, last_assoc, 0)
        normals = ms.mp_normal()
        q1 = matching.ProjectionQuery(
            pos_w=ms.mp_pos[idx], normal=normals[idx],
            min_dist=0.8 * ms.mp_min_dist[idx],
            max_dist=1.2 * ms.mp_max_dist[idx],
            desc=ms.mp_desc[idx], valid=lq_ok & ms.mp_valid[idx])
        r1 = mm_radius * (2.0 if wide else 1.0)
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

        # ---- stage 2: TrackLocalMap (Tracking.cc:1030).  The local map is
        # the points of keyframes sharing observations with the current
        # matches, capped at keyframesLimit=80 (Tracking.cc:1294-1438).
        # This restriction is not just a CPU working-set bound: matching
        # against far-away map regions would close loops silently through
        # tracking and starve the explicit loop-closing path (and is unsafe
        # under drift).  Built densely: two masked matmul-style reductions.
        inc = M.obs_incidence(ms)                              # [K, P]
        matched_mask = jnp.zeros((ms.P,), jnp.float32).at[
            jnp.where(assoc1 >= 0, assoc1, ms.P)].set(1.0)
        share = inc.astype(jnp.float32) @ matched_mask         # [K]
        kcap = min(tcfg.keyframes_limit, ms.K)
        topw, topi = jax.lax.top_k(share, kcap)
        local_kf = jnp.zeros((ms.K,), bool).at[
            jnp.where(topw > 0, topi, ms.K)].set(True)
        local_pt = jnp.any(inc & local_kf[:, None], axis=0)
        q2 = M.mp_projection_query(ms)
        q2 = q2._replace(valid=q2.valid & local_pt)
        m2, d2, _ = matching.search_by_projection(
            cam, pose1, q2, fd.xy, fd.level, fd.desc, fd.valid, fd.ur,
            sf, nl, radius=4.0 * tcfg.searching_by_projection_threshold / 5.0,
            nn_ratio=tcfg.search_local_points_nn_ratio)
        m2 = matching.resolve_duplicates(m2, d2, N)
        mp_ids = jnp.arange(ms.P, dtype=jnp.int32)
        assoc2 = _assoc_from_query_match(m2, mp_ids, N)
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
    @jax.jit
    def insert_keyframe(ms: M.MapState, fd: FrameData, Tcw: jax.Array,
                        assoc: jax.Array, kf_slot: jax.Array,
                        mp_base: jax.Array, parent: jax.Array,
                        frame_id: jax.Array, timestamp: jax.Array
                        ) -> Tuple[M.MapState, jax.Array]:
        """CreateNewKeyFrame (Tracking.cc:1162): write the KF, record
        existing associations, create new map points from close stereo
        depth for unmatched features."""
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
        slots = mp_base + jnp.cumsum(ok_new.astype(jnp.int32)) - 1
        slots = jnp.where(ok_new, slots, 0).astype(jnp.int32)
        # guard capacity
        ok_new = ok_new & (slots < ms.P)

        pos_c = cam_mod.backproject(cam, fd.xy, fd.depth)
        pos_w = lie.transform_points(lie.se3_inv(Tcw), pos_c)
        ms = M.add_map_points(ms, slots, pos_w, ok_new,
                              ref_kf=jnp.full((N,), kf_slot, jnp.int32))
        assoc_full = jnp.where(ok_new, slots, assoc)

        ms = M.add_keyframe(ms, kf_slot, Tcw, frame_id, timestamp, fd.xy,
                            fd.level, fd.angle, fd.desc, fd.valid, fd.ur,
                            fd.depth, assoc_full, parent)
        feat_idx = jnp.arange(N, dtype=jnp.int32)
        obs_ok = assoc_full >= 0
        ms = M.add_observations(ms, kf_slot, feat_idx, assoc_full, obs_ok,
                                sf, nl)
        return ms, jnp.sum(ok_new.astype(jnp.int32))

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

    return (init_stereo, track, track_ref_kf, insert_keyframe,
            ref_tracked_count, pose_covariance, apply_counters)


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
