"""Local mapping: the array analogue of ``LocalMapping`` (src/LocalMapping.cc).

Steps (exposed both as standalone jits and as un-jitted bodies):
  * local_ba        — window selection by covisibility + Schur-complement BA
                      + outlier-observation erasure
                      (Optimizer::LocalBundleAdjustment, Optimizer.cc:497)
  * cull_map_points — recent-point quality culling (LocalMapping.cc:170)
  * cull_keyframes  — redundancy culling (LocalMapping.cc:629)
  * fuse_into_kf    — SearchInNeighbors (LocalMapping.cc:454)

``make_mapping_step`` fuses the whole LocalMapping::Run iteration
(insert → cull points → triangulate over top-k covisible neighbours →
fuse → local BA → cull keyframes) into ONE jitted program so a keyframe
insertion costs one dispatch + one small stats fetch instead of ~9 host
round trips (VERDICT r2 weak #1).

Shape discipline: no [K, P] incidence materialization anywhere — keyframe
window selection and point-mask construction use the [K, N] gather/scatter
helpers in models/map_state.py.
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
from orbslam2_tpu.ops import triangulate as tri_mod
from orbslam2_tpu.utils import camera as cam_mod

MIN_COVIS_WEIGHT = 15  # covisibility edge threshold (KeyFrame.cc:325)


def fuse_points_into_kf(ms: M.MapState, kf, pt_mask, cam, cfg
                        ):
    """Core of ORBmatcher::Fuse (ORBmatcher.cc:821) against keyframe ``kf``,
    restricted to points in ``pt_mask``: merge on conflicting association
    (keep the better-observed point), attach where unassociated.

    Candidates are compacted to the top-C in-frustum points before the
    Hamming matrix, so cost is [C, N] not [P, N].
    Returns (ms, n_merged)."""
    N = ms.N
    C = min(cfg.capacity.fuse_candidates, ms.P)
    Tcw = ms.kf_pose[kf]
    normals = ms.mp_normal()
    vis, _, _, _, _ = cam_mod.in_frustum(
        cam, Tcw, ms.mp_pos, 0.8 * ms.mp_min_dist, 1.2 * ms.mp_max_dist,
        normals)
    cand = pt_mask & ms.mp_valid & vis
    ids, sel_ok = M.compact_mask(cand, C)
    q = matching.ProjectionQuery(
        pos_w=ms.mp_pos[ids], normal=normals[ids],
        min_dist=ms.mp_min_dist[ids],
        max_dist=ms.mp_max_dist[ids],
        desc=ms.mp_desc[ids], valid=sel_ok)
    m, d, _ = matching.search_by_projection(
        cam, Tcw, q, ms.kf_xy[kf], ms.kf_level[kf], ms.kf_desc[kf],
        ms.kf_kp_valid[kf], ms.kf_ur[kf], cfg.orb.scale_factor,
        cfg.orb.n_levels, radius=3.0, nn_ratio=2.0,
        check_ur=True, th_dist=matching.TH_LOW)
    m = matching.resolve_duplicates(m, d, N)
    P = ms.P
    pids = ids                                         # [C] real point ids
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

    attach = (m >= 0) & (existing == M.NO_MP) & sel_ok & ms.mp_valid[pids]
    ms = M.add_observations(ms, kf, f_safe, pids, attach,
                            cfg.orb.scale_factor, cfg.orb.n_levels)
    return ms, n_merged


def make_mapping_fns(cfg: SlamConfig):
    cam = cam_mod.Camera.from_config(cfg.camera)
    L = cfg.capacity.local_ba_keyframes       # free-camera window cap
    F = min(max(8, L // 2),                   # fixed-anchor cap
            cfg.capacity.max_keyframes)       # (top_k bound at tiny K)
    P_loc = cfg.capacity.local_ba_points
    N = cfg.orb.n_features_padded
    sigma2 = np.array([cfg.orb.scale_factor ** (2 * l)
                       for l in range(cfg.orb.n_levels)], np.float32)
    inv_sigma2 = (1.0 / sigma2).astype(np.float32)  # numpy: jit closure const

    def local_ba_body(ms: M.MapState, current_kf: jax.Array
                      ) -> Tuple[M.MapState, jax.Array]:
        """Returns (ms, n_outlier_obs_removed)."""
        K = ms.K
        w_cur = M.covisibility_row(ms, current_kf).at[
            current_kf].set(1 << 28)
        # KF 0 is the gauge anchor → never free (Optimizer.cc:512 id==0)
        w_free = jnp.where(jnp.arange(K) == 0, 0, w_cur)
        w_free = jnp.where(ms.kf_valid, w_free, 0)
        topw, free_ids = jax.lax.top_k(w_free, L)
        free_ok = topw >= MIN_COVIS_WEIGHT
        free_ok = free_ok | (free_ids == current_kf)
        free_mask_k = jnp.zeros((K,), bool).at[
            jnp.where(free_ok, free_ids, K)].set(True)

        pt_mask = M.points_of_kfs(ms, free_mask_k) & ms.mp_valid
        pt_ids, pt_sel = M.compact_mask(pt_mask, P_loc)
        local_of = jnp.full((ms.P,), -1, jnp.int32).at[
            jnp.where(pt_sel, pt_ids, ms.P)].set(
            jnp.arange(P_loc, dtype=jnp.int32))

        # fixed anchors: strongest covisible KFs observing selected points
        # but outside the free window (Optimizer.cc:533-548; weight-ranked
        # where the reference takes all, bounded for static shape)
        sees_sel = M.kf_share_counts(ms, pt_mask) > 0
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

        # erase outlier observations (Optimizer.cc:755-801) — one batched
        # scatter over the whole window instead of L+F sequential passes
        outlier = prob.valid & (~inlier)
        out2d = outlier.reshape(L + F, N)
        n_removed = jnp.sum(outlier.astype(jnp.int32))
        ms = M.remove_observations_batch(ms, window_ids, out2d)
        return ms, n_removed

    def fuse_into_kf_body(ms: M.MapState, kf: jax.Array
                          ) -> Tuple[M.MapState, jax.Array]:
        """SearchInNeighbors (LocalMapping.cc:454): fuse the covisible
        neighbourhood's points into the freshly inserted keyframe, and
        the keyframe's points back into the neighbourhood (two-way, as in
        the reference).  Only covisible neighbours' points take part —
        fusing against the whole map would stitch revisited regions
        silently and rob loop closing of its detection."""
        W_row = M.covisibility_row(ms, kf)
        neigh = (W_row >= MIN_COVIS_WEIGHT).at[kf].set(True)
        local_pt = M.points_of_kfs(ms, neigh)
        ms, n1 = fuse_points_into_kf(ms, kf, local_pt, cam, cfg)
        # reverse direction: project kf's own points into the strongest
        # covisible neighbour (bounded variant of the reference's loop
        # over all target KFs, LocalMapping.cc:496-533)
        w2 = M.covisibility_row(ms, kf)
        best_nb = jnp.argmax(w2)

        def rev(m):
            own_pt = M.points_of_kf(m, kf)
            return fuse_points_into_kf(m, best_nb, own_pt, cam, cfg)

        ms, n2 = jax.lax.cond(w2[best_nb] >= MIN_COVIS_WEIGHT, rev,
                              lambda m: (m, jnp.int32(0)), ms)
        return ms, n1 + n2

    def cull_map_points_body(ms: M.MapState, current_kf_count: jax.Array
                             ) -> Tuple[M.MapState, jax.Array]:
        """MapPointCulling (LocalMapping.cc:170): recent points must earn a
        found/visible ratio ≥ 0.25 and enough observations."""
        age = current_kf_count - ms.mp_first_kf
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

    def cull_keyframes_body(ms: M.MapState, current_kf: jax.Array
                            ) -> Tuple[M.MapState, jax.Array]:
        """KeyFrameCulling (LocalMapping.cc:629): a covisible KF is culled
        when ≥90% of its tracked points are seen by ≥3 other KFs at the
        same or finer pyramid level.  Dense build: per-point level
        histograms via scatter-add, cumulative over levels.  Culls up to
        ``kf_cull_victims`` per pass (multi-victim: capacity pressure must
        drain faster than one KF per insert, VERDICT r2 #9)."""
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
        others = total - 1
        redundant = ok & (others >= 3)
        n_tracked = jnp.sum(ok.astype(jnp.int32), axis=1)
        n_red = jnp.sum(redundant.astype(jnp.int32), axis=1)
        frac = n_red.astype(jnp.float32) / jnp.maximum(
            n_tracked.astype(jnp.float32), 1.0)

        is_local = M.covisibility_row(ms, current_kf) >= MIN_COVIS_WEIGHT
        cullable = (ms.kf_valid & is_local & (frac > 0.9)
                    & (jnp.arange(K) != 0) & (jnp.arange(K) != current_kf))

        n_victims = max(1, cfg.capacity.kf_cull_victims)
        score = jnp.where(cullable, frac, -1.0)
        _, victims = jax.lax.top_k(score, n_victims)
        feat_idx = jnp.arange(N, dtype=jnp.int32)

        def cull_one(i, carry):
            ms_, n_, vic_ = carry
            victim = victims[i]
            do = cullable[victim] & ms_.kf_valid[victim]
            out = ok[victim] & do
            ms2 = M.remove_observations(ms_, victim, feat_idx, out)
            new_parent = ms_.kf_parent[victim]
            children = ms_.kf_parent == victim
            kf_parent = jnp.where(children & do, new_parent, ms2.kf_parent)
            kf_valid = ms2.kf_valid.at[victim].set(
                jnp.where(do, False, ms2.kf_valid[victim]))
            ms2 = ms2._replace(kf_valid=kf_valid, kf_parent=kf_parent)
            vic_ = vic_.at[i].set(jnp.where(do, victim, -1))
            return ms2, n_ + do.astype(jnp.int32), vic_

        ms, n_culled, victims_out = jax.lax.fori_loop(
            0, n_victims, cull_one,
            (ms, jnp.int32(0), jnp.full((n_victims,), -1, jnp.int32)))
        return ms, n_culled, victims_out

    def evict_keyframe_body(ms: M.MapState, current_kf: jax.Array,
                            newest_frame_id: jax.Array
                            ) -> Tuple[M.MapState, jax.Array]:
        """Capacity-pressure eviction: free ONE slot by removing the most
        redundant live keyframe, relaxing KeyFrameCulling's 0.9 gate —
        the fixed-capacity analogue of the reference's map bounding
        (local-map cap Tracking.cc:1384 + culling LocalMapping.cc:629 as
        the partition-pruning policy, SURVEY §5).  Protected: the gauge
        anchor (slot 0), the current reference, and keyframes from the
        last second of video (recent ones anchor the live trajectory).
        Returns (ms, victim) with victim = −1 when nothing is evictable."""
        K = ms.K
        kfm, lvl = ms.kf_mp, ms.kf_level
        ok = (kfm >= 0) & ms.kf_kp_valid & ms.kf_valid[:, None]
        mp_safe = jnp.where(ok, kfm, 0)
        nl = cfg.orb.n_levels
        hist = jnp.zeros((ms.P, nl), jnp.int32).at[
            mp_safe, jnp.clip(lvl, 0, nl - 1)].add(ok.astype(jnp.int32))
        cum = jnp.cumsum(hist, axis=1)
        total = cum[mp_safe, jnp.clip(lvl + 1, 0, nl - 1)]
        redundant = ok & (total - 1 >= 3)
        n_tracked = jnp.sum(ok.astype(jnp.int32), axis=1)
        frac = jnp.sum(redundant.astype(jnp.int32), axis=1).astype(
            jnp.float32) / jnp.maximum(n_tracked.astype(jnp.float32), 1.0)

        recent = ms.kf_frame_id >= newest_frame_id - jnp.int32(
            max(int(cfg.camera.fps), 1))
        cullable = (ms.kf_valid & (jnp.arange(K) != 0)
                    & (jnp.arange(K) != current_kf) & ~recent)
        # most-redundant wins; older keyframe breaks ties (the +1 offset
        # keeps every cullable score positive so frac=0 stays evictable)
        score = jnp.where(
            cullable,
            1.0 + frac - 1e-9 * ms.kf_frame_id.astype(jnp.float32), -1.0)
        victim = jnp.argmax(score)
        do = score[victim] > 0.0
        out = ok[victim] & do
        ms2 = M.remove_observations(ms, victim,
                                    jnp.arange(N, dtype=jnp.int32), out)
        children = ms.kf_parent == victim
        kf_parent = jnp.where(children & do, ms.kf_parent[victim],
                              ms2.kf_parent)
        kf_valid = ms2.kf_valid.at[victim].set(
            jnp.where(do, False, ms2.kf_valid[victim]))
        ms2 = ms2._replace(kf_valid=kf_valid, kf_parent=kf_parent)
        return ms2, jnp.where(do, victim, -1)

    local_ba = jax.jit(local_ba_body)
    cull_map_points = jax.jit(cull_map_points_body)
    cull_keyframes = jax.jit(cull_keyframes_body)
    fuse_into_kf = jax.jit(fuse_into_kf_body)
    evict_keyframe = jax.jit(evict_keyframe_body)
    return MappingFns(
        local_ba=local_ba, cull_map_points=cull_map_points,
        cull_keyframes=cull_keyframes, fuse_into_kf=fuse_into_kf,
        evict_keyframe=evict_keyframe,
        local_ba_body=local_ba_body,
        cull_map_points_body=cull_map_points_body,
        cull_keyframes_body=cull_keyframes_body,
        evict_keyframe_body=evict_keyframe_body,
        fuse_into_kf_body=fuse_into_kf_body)


class MappingFns:
    """Jitted mapping steps + un-jitted bodies.  Iterable for the historic
    4-tuple unpacking (local_ba, cull_mp, cull_kf, fuse)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __iter__(self):
        return iter((self.local_ba, self.cull_map_points,
                     self.cull_keyframes, self.fuse_into_kf))


def make_mapping_step(cfg: SlamConfig):
    """ONE jitted program for the whole keyframe-insertion pipeline
    (LocalMapping::Run order, LocalMapping.cc:48-112):

        counter fold → CreateNewKeyFrame → MapPointCulling →
        CreateNewMapPoints (top-k covisible neighbours, lax.fori_loop) →
        SearchInNeighbors (two-way fuse) → LocalBundleAdjustment (lax.cond)
        → KeyFrameCulling (lax.cond)

    do_ba / do_cull are device scalars so the mapping-policy conditions
    (≥3 KFs, queue empty ↔ mbAbortBA) never retrace.  Returns
    (ms, stats[7 + V]) with stats = [n_new_points, n_culled_points,
    n_triangulated, n_fused, n_ba_outliers, n_kfs_culled, n_live_points,
    victim_slot_0..V−1 (−1 = none)] — ONE host fetch per insertion.
    """
    from orbslam2_tpu.runtime import tracking as tracking_mod

    tfns = tracking_mod.make_tracking_fns(cfg)
    mfns = make_mapping_fns(cfg)
    tri_between, insert_tri = tri_mod.make_triangulation_bodies(cfg)
    nb_default = 20 if cfg.sensor == MONOCULAR else 10
    TRI_NB = min(cfg.capacity.triangulation_neighbors or nb_default,
                 cfg.capacity.max_keyframes - 1)
    V = max(1, cfg.capacity.kf_cull_victims)

    @jax.jit
    def mapping_step(ms: M.MapState, fd, Tcw, assoc, kf_slot, kf_ordinal,
                     parent, frame_id, timestamp, do_ba, do_cull,
                     vis_acc, found_acc):
        ms = ms._replace(mp_visible=ms.mp_visible + vis_acc,
                         mp_found=ms.mp_found + found_acc)
        ms, n_new = tfns.insert_keyframe_body(
            ms, fd, Tcw, assoc, kf_slot, kf_ordinal, parent, frame_id,
            timestamp)
        ms, n_culled = mfns.cull_map_points_body(ms, kf_ordinal)

        # CreateNewMapPoints over the top covisible neighbours: the
        # TRI_NB epipolar matchers + triangulations are independent given
        # the pre-insert map, so they run as ONE vmapped batch (the
        # reference's sequential neighbour loop, LocalMapping.cc:211, is a
        # CPU shape); only slot allocation + observation insertion is
        # sequential.  A candidate matched against several neighbours is
        # inserted once — later inserts see kf_mp[kf_slot] set and their
        # "free feature" gate fails.
        w = M.covisibility_row(ms, kf_slot)
        topw, topi = jax.lax.top_k(w, TRI_NB)
        tris = jax.vmap(lambda nb: tri_between(ms, kf_slot, nb))(topi)

        def tri_iter(i, carry):
            ms_, n_ = carry
            tri = jax.tree_util.tree_map(lambda x: x[i], tris)
            # re-check against the LIVE map: features associated by an
            # earlier neighbour's insert must not spawn duplicates
            free1 = ms_.kf_mp[kf_slot] < 0
            tri = tri._replace(
                ok=tri.ok & free1 & (topw[i] >= MIN_COVIS_WEIGHT))
            ms_, n_ins = insert_tri(ms_, kf_slot, topi[i], tri, kf_ordinal)
            return ms_, n_ + n_ins

        ms, n_tri = jax.lax.fori_loop(
            0, TRI_NB, tri_iter, (ms, jnp.int32(0)))

        ms, n_fused = mfns.fuse_into_kf_body(ms, kf_slot)
        ms, n_out = jax.lax.cond(
            do_ba, lambda m: mfns.local_ba_body(m, kf_slot),
            lambda m: (m, jnp.int32(0)), ms)
        no_vic = jnp.full((V,), -1, jnp.int32)
        ms, n_kf_culled, victims = jax.lax.cond(
            do_cull, lambda m: mfns.cull_keyframes_body(m, kf_slot),
            lambda m: (m, jnp.int32(0), no_vic), ms)
        n_live = jnp.sum(ms.mp_valid.astype(jnp.int32))
        stats = jnp.concatenate([
            jnp.stack([n_new, n_culled, n_tri, n_fused, n_out,
                       n_kf_culled, n_live]), victims])
        return ms, stats

    return mapping_step
