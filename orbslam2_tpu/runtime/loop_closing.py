"""Loop closing: the array analogue of ``LoopClosing`` (src/LoopClosing.cc).

Pipeline per keyframe (reference Run loop, :92):
  detect     — BoW query against the keyframe DB with min-score gating and
               covisibility-consistency accumulation (:139-248; host keeps
               the consecutive-group bookkeeping)
  compute    — descriptor matching between the two KFs' map points →
               batched Sim3 RANSAC (:267-360) → projection recount against
               the loop KF's neighbourhood points (:411-421)
  correct    — Sim3 pose-graph over the essential graph with the loop edge
               (:437-611 + Optimizer::OptimizeEssentialGraph) and map-point
               correction through reference KFs; global BA follows
               (RunGlobalBundleAdjustment, :679)
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.config import MONOCULAR, SlamConfig
from orbslam2_tpu.models import keyframe_db as db_mod
from orbslam2_tpu.models import map_state as M
from orbslam2_tpu.models.vocabulary import Vocabulary
from orbslam2_tpu.ops import bow, bundle, matching, pose_graph, sim3solver
from orbslam2_tpu.runtime.local_mapping import fuse_points_into_kf
from orbslam2_tpu.utils import camera as cam_mod
from orbslam2_tpu.utils import lie

EDGE_COVIS_CAP = 16  # top covisibility edges per KF in the essential graph


def make_loop_fns(cfg: SlamConfig, voc: Vocabulary):
    cam = cam_mod.Camera.from_config(cfg.camera)
    N = cfg.orb.n_features_padded
    K = cfg.capacity.max_keyframes
    lcfg = cfg.loop

    @jax.jit
    def kf_bow_vector(ms: M.MapState, kf: jax.Array) -> jax.Array:
        return bow.bow_vector(voc, ms.kf_desc[kf], ms.kf_kp_valid[kf])

    @jax.jit
    def min_neighbor_score(ms: M.MapState, db: db_mod.KeyFrameDB,
                           kf: jax.Array, vec: jax.Array) -> jax.Array:
        """Lowest BoW similarity to the query's covisible neighbours
        (LoopClosing.cc:160-174) — candidates must beat this."""
        neigh = (M.covisibility_row(ms, kf) >= 15) & ms.kf_valid & db.valid
        scores = db.bow @ vec
        return jnp.min(jnp.where(neigh, scores, jnp.inf))

    @jax.jit
    def detect(ms: M.MapState, db: db_mod.KeyFrameDB, kf: jax.Array,
               vec: jax.Array, min_score: jax.Array):
        return db_mod.detect_candidates(
            db, ms, vec, kf, min_score, cfg.capacity.loop_candidates)

    @jax.jit
    def detect_step(ms: M.MapState, db: db_mod.KeyFrameDB, kf: jax.Array):
        """ONE dispatch for the per-keyframe detection prologue: BoW
        vector + DB registration + min-neighbour-score + candidate query +
        the candidates' covisibility rows (for the host's consistency-group
        bookkeeping) — replaces 4-5 separate dispatches per keyframe."""
        vec = bow.bow_vector(voc, ms.kf_desc[kf], ms.kf_kp_valid[kf])
        db2 = db.add(kf, vec)
        neigh = (M.covisibility_row(ms, kf) >= 15) & ms.kf_valid & db2.valid
        scores_all = db2.bow @ vec
        min_score = jnp.min(jnp.where(neigh, scores_all, jnp.inf))
        cands, scores = db_mod.detect_candidates(
            db2, ms, vec, kf, min_score, cfg.capacity.loop_candidates)
        csafe = jnp.where(cands >= 0, cands, 0)
        cov_rows = jax.vmap(lambda c: M.covisibility_row(ms, c))(csafe)
        # pack (candidate id | its covisibility row) so the host needs ONE
        # small fetch for the whole consistency-group update
        cand_info = jnp.concatenate([cands[:, None], cov_rows], axis=1)
        return db2, vec, cand_info

    @jax.jit
    def match_for_sim3(ms: M.MapState, kf1: jax.Array, kf2: jax.Array,
                       key: jax.Array) -> sim3solver.Sim3Result:
        """SearchByFboW KF↔KF (dense) + Sim3 RANSAC (LoopClosing.cc:294-360)."""
        v1 = ms.kf_kp_valid[kf1] & (ms.kf_mp[kf1] >= 0)
        v2 = ms.kf_kp_valid[kf2] & (ms.kf_mp[kf2] >= 0)
        m, _ = matching.match_descriptors(
            ms.kf_desc[kf1], v1, ms.kf_desc[kf2], v2,
            nn_ratio=lcfg.sim3_nn_ratio, th=matching.TH_LOW,
            angle_a=ms.kf_angle[kf1], angle_b=ms.kf_angle[kf2])
        ok = m >= 0
        m_safe = jnp.where(ok, m, 0)
        mp1 = ms.kf_mp[kf1]
        mp2 = ms.kf_mp[kf2][m_safe]
        ok = ok & (mp1 >= 0) & (mp2 >= 0) & \
            ms.mp_valid[jnp.where(mp1 >= 0, mp1, 0)] & \
            ms.mp_valid[jnp.where(mp2 >= 0, mp2, 0)]
        p1w = ms.mp_pos[jnp.where(ok, mp1, 0)]
        p2w = ms.mp_pos[jnp.where(ok, mp2, 0)]
        p1c = lie.transform_points(ms.kf_pose[kf1], p1w[None])[0]
        p2c = lie.transform_points(ms.kf_pose[kf2], p2w[None])[0]
        return sim3solver.sim3_ransac(
            cam, p1c, p2c, ok, key,
            fix_scale=(cfg.sensor != MONOCULAR),
            n_hypotheses=128,
            min_inliers=lcfg.ransac_threshold_trigger)

    @jax.jit
    def refine_sim3(ms: M.MapState, kf1: jax.Array, kf2: jax.Array,
                    s12, R12, t12):
        """SearchBySim3 + OptimizeSim3 (LoopClosing.cc:359-370): two-way
        Sim3-guided matching widens the correspondence set, then a
        bidirectional Sim3 LM refines the transform; acceptance requires
        ≥ 20 *optimized* inliers (ransac_minimal_inliers).  Returns
        (s, R, t, n_inliers)."""
        from orbslam2_tpu.ops import sim3opt

        def feat_mp(kf):
            mp = ms.kf_mp[kf]
            ok = (mp >= 0) & ms.kf_kp_valid[kf] & \
                ms.mp_valid[jnp.where(mp >= 0, mp, 0)]
            idx = jnp.where(ok, mp, 0)
            pos_c = lie.transform_points(
                ms.kf_pose[kf], ms.mp_pos[idx][None])[0]
            return ok, idx, pos_c

        ok1, mp1, p1c_all = feat_mp(kf1)
        ok2, mp2, p2c_all = feat_mp(kf2)
        m12, _ = sim3opt.search_by_sim3(
            cam,
            ms.kf_xy[kf1], ms.kf_level[kf1], ms.kf_desc[kf1],
            ms.kf_kp_valid[kf1], p1c_all, ok1,
            ms.kf_xy[kf2], ms.kf_level[kf2], ms.kf_desc[kf2],
            ms.kf_kp_valid[kf2], p2c_all, ok2,
            ms.mp_min_dist[mp1], ms.mp_max_dist[mp1],
            ms.mp_min_dist[mp2], ms.mp_max_dist[mp2],
            s12, R12, t12, cfg.orb.scale_factor, cfg.orb.n_levels,
            width=float(cfg.camera.width), height=float(cfg.camera.height))
        pair_ok = (m12 >= 0) & ok1
        j = jnp.where(pair_ok, m12, 0)
        pair_ok = pair_ok & ok2[j]
        sigma2 = jnp.asarray(
            np.array([cfg.orb.scale_factor ** (2 * l)
                      for l in range(cfg.orb.n_levels)], np.float32))
        res = sim3opt.optimize_sim3(
            cam, p1c_all, p2c_all[j],
            ms.kf_xy[kf1], ms.kf_xy[kf2][j],
            (1.0 / sigma2)[ms.kf_level[kf1]],
            (1.0 / sigma2)[ms.kf_level[kf2][j]],
            pair_ok, s12, R12, t12,
            fix_scale=(cfg.sensor != MONOCULAR),
            iters_a=cfg.optimizer.sim3_iterations,
            iters_b=2 * cfg.optimizer.sim3_iterations)
        return res.s12, res.R12, res.t12, res.n_inliers

    @jax.jit
    def recount_matches(ms: M.MapState, kf1: jax.Array, kf2: jax.Array,
                        s12, R12, t12) -> jax.Array:
        """SearchByProjection of the loop KF's neighbourhood points through
        the corrected pose (LoopClosing.cc:411-421): total match count must
        reach the detection threshold."""
        # corrected world→kf1: Scw = S12 ∘ T_kf2_w
        R2, t2 = lie.mat_to_rt(ms.kf_pose[kf2])
        sc, Rc, tc = lie.sim3_mul(s12, R12, t12,
                                  jnp.ones(()), R2, t2)
        Tcw = lie.rt_to_mat(Rc, tc / jnp.maximum(sc, 1e-9))
        q = M.mp_projection_query(ms)
        # restrict to points seen by kf2's covisible neighbourhood
        neigh = (M.covisibility_row(ms, kf2) >= 15) | (jnp.arange(K) == kf2)
        in_neigh = M.points_of_kfs(ms, neigh)
        q = q._replace(valid=q.valid & in_neigh)
        m, d, _ = matching.search_by_projection(
            cam, Tcw, q, ms.kf_xy[kf1], ms.kf_level[kf1], ms.kf_desc[kf1],
            ms.kf_kp_valid[kf1], ms.kf_ur[kf1], cfg.orb.scale_factor,
            cfg.orb.n_levels, radius=10.0, nn_ratio=2.0,
            th_dist=matching.TH_LOW)
        m = matching.resolve_duplicates(m, d, N)
        return jnp.sum((m >= 0).astype(jnp.int32))

    @jax.jit
    def correct_loop(ms: M.MapState, kf_cur: jax.Array, kf_loop: jax.Array,
                     s12, R12, t12,
                     prev_loop_i: jax.Array, prev_loop_j: jax.Array,
                     prev_loop_ok: jax.Array) -> M.MapState:
        """Essential-graph optimization + map-point correction
        (LoopClosing::CorrectLoop + OptimizeEssentialGraph)."""
        s0, R0, t0 = pose_graph.sim3_from_se3(ms.kf_pose)

        W = M.covisibility(ms)
        covw, covi = jax.lax.top_k(
            jnp.where(ms.kf_valid[None, :], W, 0), EDGE_COVIS_CAP)  # [K, C]
        rows = jnp.repeat(jnp.arange(K, dtype=jnp.int32)[:, None],
                          EDGE_COVIS_CAP, axis=1)
        cov_ok = ((covw >= cfg.optimizer.covisible_keyframes)
                  & ms.kf_valid[rows] & (covi > rows))   # dedup i<j
        # spanning-tree edges
        par = ms.kf_parent
        par_ok = (par >= 0) & ms.kf_valid
        # previous loop edges + the new loop edge
        e_i = jnp.concatenate([
            rows.reshape(-1), jnp.arange(K, dtype=jnp.int32),
            prev_loop_i, jnp.array([kf_cur], jnp.int32)])
        e_j = jnp.concatenate([
            covi.reshape(-1), jnp.where(par_ok, par, 0),
            prev_loop_j, jnp.array([kf_loop], jnp.int32)])
        e_w = jnp.concatenate([
            cov_ok.reshape(-1).astype(jnp.float32),
            par_ok.astype(jnp.float32),
            prev_loop_ok.astype(jnp.float32),
            jnp.ones((1,), jnp.float32)])

        # measurements: current relative poses for all edges; the loop edge
        # carries the Sim3-computed correction instead
        si, Ri, ti = s0[e_i], R0[e_i], t0[e_i]
        sj, Rj, tj = s0[e_j], R0[e_j], t0[e_j]
        inv = lie.sim3_inv(sj, Rj, tj)
        m_s, m_R, m_t = lie.sim3_mul(si, Ri, ti, *inv)
        m_s = m_s.at[-1].set(s12)
        m_R = m_R.at[-1].set(R12)
        m_t = m_t.at[-1].set(t12)

        fixed = jnp.zeros((K,), bool).at[kf_loop].set(True)
        prob = pose_graph.PoseGraphProblem(
            s=s0, R=R0, t=t0, fixed=fixed, vertex_valid=ms.kf_valid,
            e_i=e_i, e_j=e_j, m_s=m_s, m_R=m_R, m_t=m_t, e_weight=e_w)
        s1, R1, t1 = pose_graph.optimize_pose_graph(
            prob, n_iters=cfg.optimizer.essential_graph_iterations,
            cg_iters=64, fix_scale=(cfg.sensor != MONOCULAR))

        # map points follow their reference KF (Optimizer.cc:1057-1087)
        ref = jnp.clip(ms.mp_ref_kf, 0, K - 1)
        new_pos = pose_graph.correct_points(
            ms.mp_pos, s0[ref], R0[ref], t0[ref], s1[ref], R1[ref], t1[ref])
        mp_pos = jnp.where(ms.mp_valid[:, None], new_pos, ms.mp_pos)
        kf_pose = jnp.where(ms.kf_valid[:, None, None],
                            pose_graph.se3_from_sim3(s1, R1, t1),
                            ms.kf_pose)
        return ms._replace(kf_pose=kf_pose, mp_pos=mp_pos)

    @jax.jit
    def fuse_after_loop(ms: M.MapState, kf_cur: jax.Array,
                        kf_loop: jax.Array):
        """SearchAndFuse (LoopClosing.cc:553-577, 621): after the pose
        graph aligns both sides of the loop, merge the duplicated geometry —
        loop-region points into the current KF and vice versa."""
        neigh_l = (M.covisibility_row(ms, kf_loop) >= 15).at[kf_loop].set(True)
        loop_pts = M.points_of_kfs(ms, neigh_l)
        ms, n1 = fuse_points_into_kf(ms, kf_cur, loop_pts, cam, cfg)
        neigh_c = (M.covisibility_row(ms, kf_cur) >= 15).at[kf_cur].set(True)
        cur_pts = M.points_of_kfs(ms, neigh_c)
        ms, n2 = fuse_points_into_kf(ms, kf_loop, cur_pts, cam, cfg)
        return ms, n1 + n2

    @jax.jit
    def global_ba(ms: M.MapState) -> M.MapState:
        """RunGlobalBundleAdjustment (LoopClosing.cc:679) — all KFs free
        except the gauge anchor, every live point, every observation."""
        kfm = ms.kf_mp
        obs_ok = (kfm >= 0) & ms.kf_kp_valid & ms.kf_valid[:, None]
        cam_i = jnp.repeat(jnp.arange(K, dtype=jnp.int32)[:, None], N, axis=1)
        sigma2 = jnp.asarray(
            np.array([cfg.orb.scale_factor ** (2 * l)
                      for l in range(cfg.orb.n_levels)], np.float32))
        prob = bundle.BAProblem(
            poses=ms.kf_pose, points=ms.mp_pos, point_valid=ms.mp_valid,
            cam_i=cam_i.reshape(-1),
            pt_i=jnp.where(obs_ok, kfm, 0).reshape(-1),
            uv=ms.kf_xy.reshape(-1, 2), ur=ms.kf_ur.reshape(-1),
            inv_sigma2=(1.0 / sigma2)[ms.kf_level].reshape(-1),
            valid=obs_ok.reshape(-1))
        poses, points, inlier = bundle.bundle_adjust(
            cam, prob, n_free=K, iters_a=5, iters_b=5, fix_first_free=True,
            solver="cg")
        return ms._replace(
            kf_pose=jnp.where(ms.kf_valid[:, None, None], poses, ms.kf_pose),
            mp_pos=jnp.where(ms.mp_valid[:, None], points, ms.mp_pos))

    @jax.jit
    def frame_bow_vector(desc: jax.Array, valid: jax.Array) -> jax.Array:
        return bow.bow_vector(voc, desc, valid)

    @jax.jit
    def reloc_attempt(ms: M.MapState, fd_desc, fd_valid, fd_xy, fd_level,
                      fd_ur, fd_angle, kf: jax.Array, key: jax.Array):
        """One relocalization candidate (Tracking::Relocalization inner
        loop, Tracking.cc:1440-1603): brute-force descriptor match against
        the candidate KF's map points → EPnP RANSAC → pose-opt polish →
        the two-stage SearchByProjection rescue (Tracking.cc:1549-1580):
        10–49 inliers trigger a 10 px / TH_HIGH window re-match +
        re-optimization, then 30–49 a 3 px / 64 window — the path that
        makes relocalization work when the direct BoW match is thin.
        Returns (Tcw, n_inliers, assoc)."""
        from orbslam2_tpu.ops import pnp, pose_opt

        N_kp = fd_xy.shape[0]
        kdesc = ms.kf_desc[kf]
        kmp = ms.kf_mp[kf]
        kvalid = ms.kf_kp_valid[kf] & (kmp >= 0)
        m, _ = matching.match_descriptors(
            fd_desc, fd_valid, kdesc, kvalid,
            nn_ratio=cfg.tracking.relocalization_nn_ratio,
            th=matching.TH_LOW, angle_a=fd_angle,
            angle_b=ms.kf_angle[kf])
        ok = m >= 0
        msafe = jnp.where(ok, m, 0)
        mp = kmp[msafe]
        ok = ok & (mp >= 0) & ms.mp_valid[jnp.where(mp >= 0, mp, 0)]
        assoc = jnp.where(ok, mp, M.NO_MP)
        pts_w = ms.mp_pos[jnp.where(ok, mp, 0)]
        sigma2 = jnp.asarray(
            np.array([cfg.orb.scale_factor ** (2 * l)
                      for l in range(cfg.orb.n_levels)], np.float32))
        inv_s2 = (1.0 / sigma2)[fd_level]
        res = pnp.pnp_ransac(
            cam, pts_w, fd_xy, sigma2[fd_level], ok, key,
            n_hypotheses=128,
            chi2_th=cfg.tracking.pnp_ransac_th2,
            min_inliers=cfg.tracking.pnp_ransac_min_inliers)
        obs = pose_opt.PoseObs(
            pts_w=pts_w, uv=fd_xy, ur=fd_ur, inv_sigma2=inv_s2, valid=ok)
        Tcw, inl, n = pose_opt.pose_optimization(cam, res.Tcw, obs)
        assoc = jnp.where(inl, assoc, M.NO_MP)
        n = jnp.where(res.ok, n, 0)

        # candidate KF's map points as a projection query (the rescue
        # matches against MapPoint descriptors, ORBmatcher.cc:1468-1593)
        kmp_safe = jnp.where(kvalid, kmp, 0)
        normals = ms.mp_normal()

        def rescue(Tcw, assoc, radius, th_dist):
            """SearchByProjection(frame, candidate, sFound, radius, th) +
            re-optimization; already-associated points are excluded."""
            found = jnp.zeros((ms.P,), bool).at[
                jnp.where(assoc >= 0, assoc, ms.P)].set(True)
            qvalid = kvalid & ms.mp_valid[kmp_safe] & (~found[kmp_safe])
            q = matching.ProjectionQuery(
                pos_w=ms.mp_pos[kmp_safe], normal=normals[kmp_safe],
                min_dist=ms.mp_min_dist[kmp_safe],
                max_dist=ms.mp_max_dist[kmp_safe],
                desc=ms.mp_desc[kmp_safe], valid=qvalid)
            m2, d2, _ = matching.search_by_projection(
                cam, Tcw, q, fd_xy, fd_level, fd_desc, fd_valid, fd_ur,
                cfg.orb.scale_factor, cfg.orb.n_levels, radius=radius,
                nn_ratio=2.0, th_dist=th_dist)
            m2 = matching.resolve_duplicates(m2, d2, N_kp)
            add_assoc = jnp.full((N_kp + 1,), M.NO_MP, jnp.int32).at[
                jnp.where(m2 >= 0, m2, N_kp)].set(
                jnp.where(m2 >= 0, kmp_safe, M.NO_MP))[:N_kp]
            merged = jnp.where(assoc >= 0, assoc, add_assoc)
            n_add = jnp.sum((add_assoc >= 0).astype(jnp.int32))
            ok3 = merged >= 0
            obs3 = pose_opt.PoseObs(
                pts_w=ms.mp_pos[jnp.where(ok3, merged, 0)],
                uv=fd_xy, ur=fd_ur, inv_sigma2=inv_s2, valid=ok3)
            Tcw3, inl3, n3 = pose_opt.pose_optimization(cam, Tcw, obs3)
            return Tcw3, jnp.where(inl3, merged, M.NO_MP), n3, n_add

        def coarse(args):
            Tcw, assoc, n = args
            Tcw2, assoc2, n2, n_add = rescue(Tcw, assoc, jnp.float32(10.0),
                                             jnp.float32(matching.TH_HIGH))
            hit = n_add + n >= 50          # Tcw.cc:1555 acceptance gate

            def narrow(args2):
                Tcw2, assoc2, n2 = args2
                Tcw4, assoc4, n4, n_add2 = rescue(
                    Tcw2, assoc2, jnp.float32(3.0), jnp.float32(64.0))
                take = n2 + n_add2 >= 50   # :1569 final gate
                return jax.tree_util.tree_map(
                    lambda a, b: jnp.where(take, a, b),
                    (Tcw4, assoc4, n4), (Tcw2, assoc2, n2))

            out = jax.lax.cond(
                hit & (n2 > 30) & (n2 < 50), narrow,
                lambda a: a, (Tcw2, assoc2, n2))
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(hit, a, b),
                out, (Tcw, assoc, n))

        Tcw, assoc, n = jax.lax.cond(
            (n >= 10) & (n < 50), coarse, lambda a: a, (Tcw, assoc, n))
        return Tcw, n, assoc

    return (kf_bow_vector, min_neighbor_score, detect, match_for_sim3,
            recount_matches, correct_loop, global_ba, frame_bow_vector,
            reloc_attempt, fuse_after_loop, refine_sim3, detect_step)


class LoopCloser:
    """Host-side orchestration with the consistency-group bookkeeping of
    DetectLoop (LoopClosing.cc:188-248)."""

    def __init__(self, cfg: SlamConfig, voc: Vocabulary):
        self.cfg = cfg
        self.voc = voc
        (self.f_bow, self.f_min_score, self.f_detect, self.f_sim3,
         self.f_recount, self.f_correct, self.f_gba, self.f_frame_bow,
         self.f_reloc, self.f_fuse_loop, self.f_refine_sim3,
         self.f_detect_step) = make_loop_fns(cfg, voc)
        self.db = db_mod.KeyFrameDB.empty(cfg.capacity.max_keyframes,
                                          voc.n_words)
        # multi-device hosts: shard the [K, W] BoW matrix over the mesh
        # and route detection through the partitioned matvec (SURVEY §2.4
        # P6 "loop-closure candidate scoring sharded across the keyframe
        # DB") — mirrors GbaManager's mesh routing (gba.py)
        self.mesh = None
        if jax.device_count() > 1:
            from orbslam2_tpu.parallel.mesh import make_mesh
            from orbslam2_tpu.parallel import db_shard
            self.mesh = make_mesh()
            self.db = db_shard.shard_db(self.mesh, self.db)
            self.f_detect_step = self._sharded_detect_step(
                self.f_detect_step)
        from orbslam2_tpu.runtime.gba import GbaManager
        self.gba = GbaManager(cfg)
        self.consistent_groups: List[Tuple[Set[int], int]] = []
        self.prev_loops: List[Tuple[int, int]] = []
        self.last_loop_kf = -1
        self._key = jax.random.PRNGKey(42)
        self._f_covis_row = jax.jit(M.covisibility_row)

    def _split_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _sharded_detect_step(self, base):
        """Wrap detect_step with mesh sharding constraints: the DB rows
        stay partitioned over the data axis across calls, GSPMD runs the
        [K, W] query matvec as per-device [K/D, W] partials, and only the
        [K]-sized scores/cand_info are gathered (the lone collective per
        query; cross-host this is the only DCN traffic)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from orbslam2_tpu.parallel.mesh import DATA_AXIS
        row = NamedSharding(self.mesh, P(DATA_AXIS, None))
        rep = NamedSharding(self.mesh, P())

        @jax.jit
        def sharded_step(ms, db, kf):
            db = db._replace(
                bow=jax.lax.with_sharding_constraint(db.bow, row))
            db2, vec, cand_info = base(ms, db, kf)
            return (db2._replace(
                        bow=jax.lax.with_sharding_constraint(db2.bow, row)),
                    jax.lax.with_sharding_constraint(vec, rep),
                    jax.lax.with_sharding_constraint(cand_info, rep))

        return sharded_step

    def reset_db(self) -> None:
        """Fresh empty DB, re-sharded over the mesh when one exists."""
        self.db = db_mod.KeyFrameDB.empty(self.cfg.capacity.max_keyframes,
                                          self.voc.n_words)
        if self.mesh is not None:
            from orbslam2_tpu.parallel import db_shard
            self.db = db_shard.shard_db(self.mesh, self.db)

    def add_keyframe(self, ms: M.MapState, kf: int) -> None:
        vec = self.f_bow(ms, jnp.int32(kf))
        self.db = self.db.add(jnp.int32(kf), vec)
        self._last_vec = vec

    def prewarm(self, ms: M.MapState) -> None:
        """Compile every loop-closing program once (serving/bench prewarm:
        the Sim3/correction path otherwise compiles on the FIRST real loop
        candidate, mid-sequence)."""
        import jax as _jax
        k0 = jnp.int32(0)
        r = self.f_sim3(ms, k0, k0, self._split_key())
        s, R12, t12, _ = self.f_refine_sim3(ms, k0, k0, r.s12, r.R12, r.t12)
        self.f_recount(ms, k0, k0, s, R12, t12)
        CAP = 8
        z = jnp.zeros((CAP,), jnp.int32)
        ms2 = self.f_correct(ms, k0, k0, s, R12, t12, z, z,
                             jnp.zeros((CAP,), bool))
        ms2, _ = self.f_fuse_loop(ms2, k0, k0)
        _jax.block_until_ready(self.f_detect_step(ms, self.db, k0))
        _jax.block_until_ready(ms2.kf_pose)

    def prewarm_reloc(self, ms: M.MapState, fd) -> None:
        """Compile the relocalization programs (frame BoW + DB query +
        per-candidate EPnP attempt) — otherwise they compile on the first
        real LOST frame, mid-sequence."""
        import jax as _jax
        vec = self.f_frame_bow(fd.desc, fd.valid)
        self.f_detect(ms, self.db, jnp.int32(-1), vec, jnp.float32(0.0))
        out = self.f_reloc(ms, fd.desc, fd.valid, fd.xy, fd.level, fd.ur,
                           fd.angle, jnp.int32(0), self._split_key())
        _jax.block_until_ready(out[0])

    def on_keyframe(self, ms: M.MapState, kf: int, kf_ordinal: int
                    ) -> Tuple[M.MapState, bool]:
        """DB registration + loop detection (+ correction on success) for
        keyframe slot ``kf`` — the whole LoopClosing::Run iteration.  The
        detection prologue is ONE fused dispatch + ONE small fetch
        (f_detect_step); db add is idempotent so calling after
        add_keyframe is safe."""
        db2, vec, cand_info = self.f_detect_step(ms, self.db, jnp.int32(kf))
        self.db = db2
        self._last_vec = vec
        lcfg = self.cfg.loop
        if kf_ordinal < lcfg.minimum_keyframes or \
                kf_ordinal - self.last_loop_kf < lcfg.minimum_keyframes:
            return ms, False
        info = np.asarray(cand_info)            # the ONE fetch
        cands = [int(c) for c in info[:, 0] if c >= 0]
        if not cands:
            self.consistent_groups = []
            return ms, False
        rows = {int(info[i, 0]): info[i, 1:] for i in range(len(info))
                if info[i, 0] >= 0}
        return self._evaluate_candidates(ms, kf, kf_ordinal, cands, rows)

    def process(self, ms: M.MapState, kf: int, kf_ordinal: int
                ) -> Tuple[M.MapState, bool]:
        """Back-compat wrapper: detection for an already-registered
        keyframe (add is idempotent)."""
        return self.on_keyframe(ms, kf, kf_ordinal)

    # ------------------------------------------- deferred (pipelined) API
    def on_keyframe_deferred(self, ms: M.MapState, kf: int,
                             kf_ordinal: int) -> None:
        """Dispatch the detection prologue without fetching — the windowed
        engine retires it at the next window via :meth:`poll_deferred`
        (the reference's LoopClosing thread also trails Tracking by its
        queue, LoopClosing.cc:126)."""
        db2, vec, cand_info = self.f_detect_step(ms, self.db, jnp.int32(kf))
        self.db = db2
        self._last_vec = vec
        try:
            cand_info.copy_to_host_async()
        except AttributeError:
            pass
        if not getattr(self, "_deferred", None):
            self._deferred = []
        self._deferred.append((kf, kf_ordinal, cand_info))

    def poll_deferred(self, ms: M.MapState) -> Tuple[M.MapState, bool]:
        """Evaluate pending detections against the CURRENT map — a queue,
        since several keyframes may have inserted since the last poll
        (the reference's mlpLoopKeyFrameQueue drains the same way,
        LoopClosing.cc:126)."""
        pend = getattr(self, "_deferred", None)
        if not pend:
            return ms, False
        self._deferred = []
        any_closed = False
        for kf, kf_ordinal, cand_info in pend:
            lcfg = self.cfg.loop
            if kf_ordinal < lcfg.minimum_keyframes or \
                    kf_ordinal - self.last_loop_kf < lcfg.minimum_keyframes:
                continue
            info = np.asarray(cand_info)
            cands = [int(c) for c in info[:, 0] if c >= 0]
            if not cands:
                self.consistent_groups = []
                continue
            rows = {int(info[i, 0]): info[i, 1:] for i in range(len(info))
                    if info[i, 0] >= 0}
            ms, closed = self._evaluate_candidates(ms, kf, kf_ordinal,
                                                   cands, rows)
            any_closed = any_closed or closed
        return ms, any_closed

    def _evaluate_candidates(self, ms, kf: int, kf_ordinal: int,
                             cands: List[int], rows) -> Tuple[M.MapState,
                                                              bool]:
        lcfg = self.cfg.loop
        # covisibility-consistency accumulation over host sets
        # (LoopClosing.cc:188-248)
        enough: List[int] = []
        new_groups: List[Tuple[Set[int], int]] = []
        for c in cands:
            w_row = rows[c]
            group = set(np.where(w_row >= 15)[0].tolist()) | {c}
            best_consistency = 0
            for prev_set, count in self.consistent_groups:
                if group & prev_set:
                    best_consistency = max(best_consistency, count + 1)
            new_groups.append((group, best_consistency))
            if best_consistency >= lcfg.covisibility_consistency_threshold:
                enough.append(c)
        self.consistent_groups = new_groups
        if not enough:
            return ms, False

        for cand in enough:
            res = self.f_sim3(ms, jnp.int32(kf), jnp.int32(cand),
                              self._split_key())
            if not bool(res.ok):
                continue
            # SearchBySim3 + OptimizeSim3: widen matches through the RANSAC
            # transform, refine bidirectionally, accept ≥ 20 optimized
            # inliers (LoopClosing.cc:359-370)
            s12, R12, t12, n_opt = self.f_refine_sim3(
                ms, jnp.int32(kf), jnp.int32(cand),
                res.s12, res.R12, res.t12)
            if int(n_opt) < lcfg.ransac_minimal_inliers:
                continue
            n_total = int(self.f_recount(ms, jnp.int32(kf), jnp.int32(cand),
                                         s12, R12, t12))
            if n_total < lcfg.detection_threshold:
                continue
            res = res._replace(s12=s12, R12=R12, t12=t12)
            # accept: correct the map, add the loop edge, run GBA.
            # previous-loop edges are padded to a fixed capacity so the
            # correction jit never retraces
            CAP = 8
            loops = self.prev_loops[-CAP:]
            pl_i = jnp.asarray([i for i, _ in loops] + [0] * (CAP - len(loops)),
                               jnp.int32)
            pl_j = jnp.asarray([j for _, j in loops] + [0] * (CAP - len(loops)),
                               jnp.int32)
            pl_ok = jnp.asarray([True] * len(loops)
                                + [False] * (CAP - len(loops)))
            # a new loop supersedes a running GBA (mbStopGBA,
            # LoopClosing.cc:446-459)
            self.gba.abort()
            ms = self.f_correct(ms, jnp.int32(kf), jnp.int32(cand),
                                res.s12, res.R12, res.t12, pl_i, pl_j, pl_ok)
            ms, _ = self.f_fuse_loop(ms, jnp.int32(kf), jnp.int32(cand))
            # GBA runs in its own preemptible thread on the corrected
            # snapshot; results merge at a later poll (LoopClosing.cc:613)
            self.gba.launch(ms)
            self.prev_loops.append((kf, cand))
            self.last_loop_kf = kf_ordinal
            self.consistent_groups = []
            return ms, True
        return ms, False

    # ---------------------------------------------------- relocalization --
    def relocalize(self, ms: M.MapState, fd) -> Tuple[Optional[np.ndarray],
                                                      Optional[jax.Array]]:
        """Tracking::Relocalization (Tracking.cc:1440): BoW query of the DB
        → per-candidate EPnP RANSAC + pose opt; success at ≥ 50 inliers
        (:1589).  Returns (Tcw, assoc) or (None, None)."""
        vec = self.f_frame_bow(fd.desc, fd.valid)
        cands, _ = self.f_detect(ms, self.db, jnp.int32(-1), vec,
                                 jnp.float32(0.0))
        for c in np.asarray(cands):
            if c < 0:
                continue
            Tcw, n, assoc = self.f_reloc(
                ms, fd.desc, fd.valid, fd.xy, fd.level, fd.ur, fd.angle,
                jnp.int32(int(c)), self._split_key())
            if int(n) >= 50:
                return np.asarray(Tcw), assoc
        return None, None
