"""Local mapping: the array analogue of ``LocalMapping`` (src/LocalMapping.cc).

Jitted steps:
  * local_ba        — window selection by covisibility + Schur-complement BA
                      + outlier-observation erasure
                      (Optimizer::LocalBundleAdjustment, Optimizer.cc:497)
  * cull_map_points — recent-point quality culling (LocalMapping.cc:170)
  * cull_keyframes  — redundancy culling (LocalMapping.cc:629)

Triangulation of new points across covisible keyframes
(CreateNewMapPoints, LocalMapping.cc:207) lives in triangulate.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.config import MONOCULAR, SlamConfig
from orbslam2_tpu.models import map_state as M
from orbslam2_tpu.ops import bundle, matching
from orbslam2_tpu.utils import camera as cam_mod

MIN_COVIS_WEIGHT = 15  # covisibility edge threshold (KeyFrame.cc:325)


def fuse_points_into_kf(ms: M.MapState, kf, pt_mask, cam, cfg
                        ):
    """Core of ORBmatcher::Fuse (ORBmatcher.cc:821) against keyframe ``kf``,
    restricted to points in ``pt_mask``: merge on conflicting association
    (keep the better-observed point), attach where unassociated.
    Returns (ms, n_merged)."""
    N = ms.N
    Tcw = ms.kf_pose[kf]
    q = M.mp_projection_query(ms)
    q = q._replace(valid=q.valid & pt_mask)
    m, d, _ = matching.search_by_projection(
        cam, Tcw, q, ms.kf_xy[kf], ms.kf_level[kf], ms.kf_desc[kf],
        ms.kf_kp_valid[kf], ms.kf_ur[kf], cfg.orb.scale_factor,
        cfg.orb.n_levels, radius=3.0, nn_ratio=2.0,
        check_ur=True, th_dist=matching.TH_LOW)
    m = matching.resolve_duplicates(m, d, N)
    P = ms.P
    pids = jnp.arange(P, dtype=jnp.int32)
    f_safe = jnp.where(m >= 0, m, 0)
    existing = jnp.where(m >= 0, ms.kf_mp[kf, f_safe], -2)

    merge = (m >= 0) & (existing >= 0) & (existing != pids)
    ex_safe = jnp.where(merge, existing, 0)
    p_wins = ms.mp_n_obs[pids] > ms.mp_n_obs[ex_safe]
    old = jnp.where(p_wins, ex_safe, pids)
    new = jnp.where(p_wins, pids, ex_safe)
    old_to_new = jnp.full((P,), -1, jnp.int32).at[
        jnp.where(merge, old, P)].set(new)
    y_safe = jnp.where(old_to_new >= 0, old_to_new, 0)
    chain = (old_to_new >= 0) & (old_to_new[y_safe] >= 0)
    old_to_new = jnp.where(chain, -1, old_to_new)
    n_merged = jnp.sum((old_to_new >= 0).astype(jnp.int32))
    ms = M.replace_map_points(ms, old_to_new)

    attach = (m >= 0) & (existing == M.NO_MP) & ms.mp_valid
    ms = M.add_observations(ms, kf, f_safe, pids, attach,
                            cfg.orb.scale_factor, cfg.orb.n_levels)
    return ms, n_merged


def make_mapping_fns(cfg: SlamConfig):
    cam = cam_mod.Camera.from_config(cfg.camera)
    L = cfg.capacity.local_ba_keyframes       # free-camera window cap
    F = max(8, L // 2)                        # fixed-anchor cap
    P_loc = cfg.capacity.local_ba_points
    N = cfg.orb.n_features_padded
    sigma2 = np.array([cfg.orb.scale_factor ** (2 * l)
                       for l in range(cfg.orb.n_levels)], np.float32)
    inv_sigma2 = (1.0 / sigma2).astype(np.float32)  # numpy: jit closure const

    @jax.jit
    def local_ba(ms: M.MapState, current_kf: jax.Array
                 ) -> Tuple[M.MapState, jax.Array]:
        """Returns (ms, n_outlier_obs_removed)."""
        K = ms.K
        W = M.covisibility(ms)                       # [K, K]
        w_cur = W[current_kf].at[current_kf].set(1 << 28)
        # KF 0 is the gauge anchor → never free (Optimizer.cc:512 id==0)
        w_free = jnp.where(jnp.arange(K) == 0, 0, w_cur)
        w_free = jnp.where(ms.kf_valid, w_free, 0)
        topw, free_ids = jax.lax.top_k(w_free, L)
        free_ok = topw >= MIN_COVIS_WEIGHT
        free_ok = free_ok | (free_ids == current_kf)
        free_mask_k = jnp.zeros((K,), bool).at[
            jnp.where(free_ok, free_ids, K)].set(True)

        inc = M.obs_incidence(ms)                    # [K, P]
        pt_mask = jnp.any(inc & free_mask_k[:, None], axis=0) & ms.mp_valid
        _, pt_ids = jax.lax.top_k(pt_mask.astype(jnp.float32), P_loc)
        pt_sel = pt_mask[pt_ids]
        local_of = jnp.full((ms.P,), -1, jnp.int32).at[
            jnp.where(pt_sel, pt_ids, ms.P)].set(
            jnp.arange(P_loc, dtype=jnp.int32))

        # fixed anchors: strongest covisible KFs observing selected points
        # but outside the free window (Optimizer.cc:533-548; weight-ranked
        # where the reference takes all, bounded for static shape)
        sees_sel = jnp.any(inc & pt_mask[None, :], axis=1)
        fixed_cand = sees_sel & (~free_mask_k) & ms.kf_valid
        fixed_score = jnp.where(fixed_cand, w_cur + 1, 0)
        # KF 0 always anchors if it sees anything
        fixed_score = fixed_score.at[0].set(
            jnp.where(fixed_cand[0], 1 << 28, 0))
        topf, fixed_ids = jax.lax.top_k(fixed_score, F)
        fixed_ok = topf > 0

        window_ids = jnp.concatenate([free_ids, fixed_ids])      # [L+F]
        window_ok = jnp.concatenate([free_ok, fixed_ok])

        # observations: every (window kf, feature) whose MP is selected
        kfm = ms.kf_mp[window_ids]                   # [L+F, N]
        kpv = ms.kf_kp_valid[window_ids]
        mp_safe = jnp.where(kfm >= 0, kfm, 0)
        lidx = local_of[mp_safe]                     # local point index
        obs_ok = (kfm >= 0) & (lidx >= 0) & kpv & window_ok[:, None]
        cam_i = jnp.repeat(jnp.arange(L + F, dtype=jnp.int32)[:, None], N,
                           axis=1)
        prob = bundle.BAProblem(
            poses=ms.kf_pose[window_ids],
            points=ms.mp_pos[pt_ids],
            point_valid=pt_sel,
            cam_i=cam_i.reshape(-1),
            pt_i=jnp.where(obs_ok, lidx, 0).reshape(-1),
            uv=ms.kf_xy[window_ids].reshape(-1, 2),
            ur=ms.kf_ur[window_ids].reshape(-1),
            inv_sigma2=jnp.asarray(inv_sigma2)[
                ms.kf_level[window_ids]].reshape(-1),
            valid=obs_ok.reshape(-1))
        poses, points, inlier = bundle.bundle_adjust(
            cam, prob, n_free=L,
            iters_a=cfg.optimizer.additional_iterations_no_outliers,
            iters_b=cfg.optimizer.additional_iterations)

        # scatter back (only rows that were truly in the window)
        kf_pose = ms.kf_pose.at[jnp.where(free_ok, free_ids, K)].set(
            poses[:L])
        mp_pos = ms.mp_pos.at[jnp.where(pt_sel, pt_ids, ms.P)].set(points)
        ms = ms._replace(kf_pose=kf_pose, mp_pos=mp_pos)

        # erase outlier observations (Optimizer.cc:755-801)
        outlier = prob.valid & (~inlier)
        out2d = outlier.reshape(L + F, N)
        n_removed = jnp.sum(outlier.astype(jnp.int32))
        feat_idx = jnp.arange(N, dtype=jnp.int32)

        def body(i, ms_):
            return M.remove_observations(ms_, window_ids[i], feat_idx,
                                         out2d[i])
        ms = jax.lax.fori_loop(0, L + F, body, ms)
        return ms, n_removed

    @jax.jit
    def fuse_into_kf(ms: M.MapState, kf: jax.Array
                     ) -> Tuple[M.MapState, jax.Array]:
        """SearchInNeighbors (LocalMapping.cc:454): fuse the covisible
        neighbourhood's points into the freshly inserted keyframe.
        Only covisible neighbours' points take part (as in the reference) —
        fusing against the whole map would stitch revisited regions
        silently and rob loop closing of its detection."""
        W_row = M.covisibility_row(ms, kf)
        neigh = (W_row >= MIN_COVIS_WEIGHT).at[kf].set(True)
        inc = M.obs_incidence(ms)
        local_pt = jnp.any(inc & neigh[:, None], axis=0)
        return fuse_points_into_kf(ms, kf, local_pt, cam, cfg)

    @jax.jit
    def cull_map_points(ms: M.MapState, current_kf_count: jax.Array
                        ) -> Tuple[M.MapState, jax.Array]:
        """MapPointCulling (LocalMapping.cc:170): recent points must earn a
        found/visible ratio ≥ 0.25 and enough observations."""
        age = current_kf_count - _mp_first_count(ms)
        ratio = ms.mp_found.astype(jnp.float32) / jnp.maximum(
            ms.mp_visible.astype(jnp.float32), 1.0)
        recent = age <= 3
        # cnThObs: 2 for monocular, 3 otherwise (LocalMapping.cc:177);
        # stereo observations already count double in mp_n_obs
        th_obs = 2 if cfg.sensor == MONOCULAR else 3
        bad = ms.mp_valid & recent & (
            (ratio < 0.25)
            | ((age >= 2) & (ms.mp_n_obs <= th_obs)))
        ms = M.invalidate_map_points(ms, bad)
        return ms, jnp.sum(bad.astype(jnp.int32))

    def _mp_first_count(ms: M.MapState) -> jax.Array:
        # first_kf stores the kf slot at creation; slots are allocated in
        # order so the slot index doubles as a creation counter
        return ms.mp_first_kf

    @jax.jit
    def cull_keyframes(ms: M.MapState, current_kf: jax.Array
                       ) -> Tuple[M.MapState, jax.Array]:
        """KeyFrameCulling (LocalMapping.cc:629): a covisible KF is culled
        when ≥90% of its tracked points are seen by ≥3 other KFs at the
        same or finer pyramid level.  Dense build: per-point level
        histograms via scatter-add, cumulative over levels."""
        K, P, nl = ms.K, ms.P, cfg.orb.n_levels
        kfm, lvl = ms.kf_mp, ms.kf_level
        ok = (kfm >= 0) & ms.kf_kp_valid & ms.kf_valid[:, None]
        mp_safe = jnp.where(ok, kfm, 0)
        hist = jnp.zeros((P, nl), jnp.int32).at[
            mp_safe, jnp.clip(lvl, 0, nl - 1)].add(ok.astype(jnp.int32))
        cum = jnp.cumsum(hist, axis=1)               # obs at level ≤ l

        # per (kf, feature): #others observing at level ≤ own level+1
        lvl_cap = jnp.clip(lvl + 1, 0, nl - 1)
        total = cum[mp_safe, lvl_cap]                # [K, N] incl. self
        self_counts = 1
        others = total - self_counts
        redundant = ok & (others >= 3)
        n_tracked = jnp.sum(ok.astype(jnp.int32), axis=1)
        n_red = jnp.sum(redundant.astype(jnp.int32), axis=1)
        frac = n_red.astype(jnp.float32) / jnp.maximum(
            n_tracked.astype(jnp.float32), 1.0)

        W = M.covisibility(ms)
        is_local = W[current_kf] >= MIN_COVIS_WEIGHT
        cullable = (ms.kf_valid & is_local & (frac > 0.9)
                    & (jnp.arange(K) != 0) & (jnp.arange(K) != current_kf))
        # cull at most one KF per call (the worst offender) to keep the
        # spanning tree and counters simple — the loop converges over frames
        victim = jnp.argmax(jnp.where(cullable, frac, -1.0))
        do_cull = cullable[victim]

        # remove its observations; re-parent children to its parent
        feat_idx = jnp.arange(N, dtype=jnp.int32)
        out = ok[victim] & do_cull
        ms2 = M.remove_observations(ms, victim, feat_idx, out)
        new_parent = ms.kf_parent[victim]
        children = ms.kf_parent == victim
        kf_parent = jnp.where(children & do_cull, new_parent, ms2.kf_parent)
        kf_valid = ms2.kf_valid.at[victim].set(
            jnp.where(do_cull, False, ms2.kf_valid[victim]))
        ms2 = ms2._replace(kf_valid=kf_valid, kf_parent=kf_parent)
        return ms2, do_cull.astype(jnp.int32)

    return local_ba, cull_map_points, cull_keyframes, fuse_into_kf
