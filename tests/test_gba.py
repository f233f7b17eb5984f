"""Background preemptible global BA (runtime/gba.py) — the reference's
4th-thread GBA with mbStopGBA abort and post-GBA spanning-tree propagation
(/root/reference/src/LoopClosing.cc:613,679-788)."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.config import (CameraConfig, CapacityConfig, OrbConfig,
                                 STEREO, SlamConfig)
from orbslam2_tpu.models import map_state as M
from orbslam2_tpu.runtime.gba import GbaManager
from orbslam2_tpu.runtime.slam import SlamEngine
from orbslam2_tpu.utils import lie, synthetic


def _cfg():
    return SlamConfig(
        camera=CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                            bf=150.0, width=640, height=480, fps=10.0,
                            th_depth=60.0),
        orb=OrbConfig(n_features=400),
        capacity=CapacityConfig(max_keyframes=16, max_map_points=1 << 12,
                                local_ba_keyframes=6, local_ba_points=1024),
        sensor=STEREO)


@pytest.fixture(scope="module")
def built_map():
    """A small world-scene map built by the engine (module-scoped: the
    engine compile is the expensive part)."""
    cfg = _cfg()
    rng = np.random.default_rng(3)
    world = synthetic.make_world(rng)
    poses = synthetic.straight_trajectory(14, step=0.35)
    eng = SlamEngine(cfg, enable_loop_closing=False)
    gt = []
    for i, T in enumerate(poses):
        l, r = synthetic.render_world_stereo(world, cfg.camera, T, rng, 1.0)
        eng.track_stereo(l, r, 0.1 * i)
        gt.append(T)
    assert eng.n_kfs >= 4
    return cfg, eng.ms, gt


def _perturb(ms, rng, pose_sigma=0.02, pt_sigma=0.03):
    K = ms.K
    kf_pose = np.asarray(ms.kf_pose).copy()
    for k in range(1, K):      # keep the gauge anchor
        xi = np.concatenate([rng.normal(0, pose_sigma, 3),
                             rng.normal(0, pose_sigma * 3, 3)])
        kf_pose[k] = np.asarray(
            lie.se3_exp(jnp.asarray(xi, jnp.float32))) @ kf_pose[k]
    mp_pos = np.asarray(ms.mp_pos) + rng.normal(0, pt_sigma,
                                                ms.mp_pos.shape)
    return ms._replace(kf_pose=jnp.asarray(kf_pose),
                       mp_pos=jnp.asarray(mp_pos, jnp.float32))


def _reproj_rms(ms, cfg):
    from orbslam2_tpu.utils import camera as cam_mod
    cam = cam_mod.Camera.from_config(cfg.camera)
    ok = np.asarray((ms.kf_mp >= 0) & ms.kf_kp_valid
                    & ms.kf_valid[:, None])
    kfm = np.asarray(ms.kf_mp)
    pos = np.asarray(ms.mp_pos)
    poses = np.asarray(ms.kf_pose)
    xy = np.asarray(ms.kf_xy)
    errs = []
    for k in range(ms.K):
        idx = np.where(ok[k])[0]
        if not len(idx):
            continue
        p = pos[kfm[k, idx]]
        pc = p @ poses[k][:3, :3].T + poses[k][:3, 3]
        z = np.maximum(pc[:, 2], 1e-6)
        u = cam.fx * pc[:, 0] / z + cam.cx
        v = cam.fy * pc[:, 1] / z + cam.cy
        errs.append(np.hypot(u - xy[k, idx, 0], v - xy[k, idx, 1]))
    e = np.concatenate(errs)
    return float(np.sqrt((np.clip(e, 0, 20.0) ** 2).mean()))


def test_gba_background_converges_and_merges(built_map, rng):
    cfg, ms, _ = built_map
    ms_pert = _perturb(ms, rng)
    mgr = GbaManager(cfg)
    before = _reproj_rms(ms_pert, cfg)
    mgr.launch(ms_pert)
    mgr.wait(timeout=600)
    assert not mgr.running
    merged, applied = mgr.poll_and_merge(ms_pert)
    assert applied
    after = _reproj_rms(merged, cfg)
    assert after < 0.5 * before, (before, after)
    # second poll is a no-op
    _, applied2 = mgr.poll_and_merge(merged)
    assert not applied2


def test_gba_propagates_to_keyframe_born_mid_gba(built_map, rng):
    """A keyframe inserted while GBA runs must be rebased through its
    spanning-tree parent at merge time (LoopClosing.cc:715-757)."""
    cfg, ms, _ = built_map
    ms_pert = _perturb(ms, rng)
    mgr = GbaManager(cfg)
    mgr.launch(ms_pert)

    # "concurrently" create a new keyframe: child of the last live KF with
    # a known relative pose, plus one new point referenced to it
    kf_valid = np.asarray(ms_pert.kf_valid)
    parent = int(np.where(kf_valid)[0].max())
    free = int(np.where(~kf_valid)[0][0])
    T_rel = np.eye(4, dtype=np.float32)
    T_rel[2, 3] = 0.5
    T_child = T_rel @ np.asarray(ms_pert.kf_pose[parent])
    ms_live = ms_pert._replace(
        kf_valid=ms_pert.kf_valid.at[free].set(True),
        kf_pose=ms_pert.kf_pose.at[free].set(jnp.asarray(T_child)),
        kf_parent=ms_pert.kf_parent.at[free].set(parent),
        kf_frame_id=ms_pert.kf_frame_id.at[free].set(999))

    mgr.wait(timeout=600)
    merged, applied = mgr.poll_and_merge(ms_live)
    assert applied
    # the child's pose moved WITH its parent: relative pose is preserved
    T_child_new = np.asarray(merged.kf_pose[free])
    T_parent_new = np.asarray(merged.kf_pose[parent])
    np.testing.assert_allclose(
        T_child_new @ np.linalg.inv(T_parent_new), T_rel, atol=1e-4)


def test_gba_abort_discards_work(built_map, rng):
    cfg, ms, _ = built_map
    ms_pert = _perturb(ms, rng)
    mgr = GbaManager(cfg)
    mgr.launch(ms_pert)
    mgr.abort()                      # immediately supersede
    assert not mgr.running
    _, applied = mgr.poll_and_merge(ms_pert)
    assert not applied
    assert mgr.stats["aborted"] == 1
    # relaunch after abort works
    mgr.launch(ms_pert)
    mgr.wait(timeout=600)
    _, applied = mgr.poll_and_merge(ms_pert)
    assert applied


def test_gba_slot_reuse_guard(built_map, rng):
    """A point slot culled and re-allocated during GBA must NOT take the
    optimized position of its previous occupant (identity check on
    mp_first_kf)."""
    cfg, ms, _ = built_map
    ms_pert = _perturb(ms, rng)
    mgr = GbaManager(cfg)
    mgr.launch(ms_pert)
    # reuse a live point slot for a "new" point with a different first_kf
    slot = int(np.where(np.asarray(ms_pert.mp_valid))[0][0])
    new_pos = jnp.asarray([1.0, 2.0, 30.0], jnp.float32)
    ms_live = ms_pert._replace(
        mp_pos=ms_pert.mp_pos.at[slot].set(new_pos),
        mp_first_kf=ms_pert.mp_first_kf.at[slot].set(777),
        mp_ref_kf=ms_pert.mp_ref_kf.at[slot].set(0))
    mgr.wait(timeout=600)
    merged, applied = mgr.poll_and_merge(ms_live)
    assert applied
    # slot did not take the stale optimized position; it was corrected via
    # its reference KF (the gauge anchor ⇒ unchanged)
    got = np.asarray(merged.mp_pos[slot])
    np.testing.assert_allclose(got, np.asarray(new_pos), atol=1e-3)


def test_gba_distributed_path_matches_single(built_map, rng):
    """On a multi-device host GbaManager routes through the shard_map
    CG-Schur solver; the result must match the single-device chunked
    solve (same schedule, psum-reduced camera systems)."""
    cfg, ms, _ = built_map
    ms_pert = _perturb(ms, rng)

    mgr_d = GbaManager(cfg)                      # 8 CPU devices → mesh
    assert mgr_d.mesh is not None
    mgr_d.launch(ms_pert)
    mgr_d.wait(timeout=600)
    merged_d, ok_d = mgr_d.poll_and_merge(ms_pert)
    assert ok_d and mgr_d.stats["distributed"] == 1

    mgr_s = GbaManager(cfg, use_mesh=False)
    assert mgr_s.mesh is None
    mgr_s.launch(ms_pert)
    mgr_s.wait(timeout=600)
    merged_s, ok_s = mgr_s.poll_and_merge(ms_pert)
    assert ok_s and mgr_s.stats["distributed"] == 0

    rms_d = _reproj_rms(merged_d, cfg)
    rms_s = _reproj_rms(merged_s, cfg)
    assert rms_d < 1.2 * rms_s + 0.05, (rms_d, rms_s)
