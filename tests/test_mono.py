"""Monocular pipeline: H/F initializer unit test + end-to-end mono SLAM."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.config import (CameraConfig, CapacityConfig, MONOCULAR,
                                 OrbConfig, SlamConfig)
from orbslam2_tpu.ops import initializer
from orbslam2_tpu.runtime import tracking
from orbslam2_tpu.runtime.slam import SlamEngine
from orbslam2_tpu.utils import camera as cam_mod
from orbslam2_tpu.utils import lie, synthetic, trajectory

CAM = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0, width=640,
                   height=480, fps=10.0)


def test_initializer_fundamental_path(rng):
    """General 3D scene + translation ⇒ F model, correct pose up to scale."""
    cam = cam_mod.Camera.from_config(CAM)
    n = 300
    pts = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                    rng.uniform(5, 25, n)], -1)
    R = np.asarray(lie.so3_exp(jnp.asarray([0.02, -0.05, 0.01])))
    t = np.array([0.6, 0.05, 0.1])
    t_dir = t / np.linalg.norm(t)
    uv1 = pts[:, :2] / pts[:, 2:] * 450 + [320, 240]
    pc2 = pts @ R.T + t
    uv2 = pc2[:, :2] / pc2[:, 2:] * 450 + [320, 240]
    uv1 += rng.normal(0, 0.4, uv1.shape)
    uv2 += rng.normal(0, 0.4, uv2.shape)
    inb = ((uv2[:, 0] > 0) & (uv2[:, 0] < 640)
           & (uv2[:, 1] > 0) & (uv2[:, 1] < 480))

    res = initializer.initialize_mono(
        cam, jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
        jnp.asarray(inb), jax.random.PRNGKey(0))
    assert bool(res.ok)
    assert not bool(res.used_h)
    T2 = np.asarray(res.Tcw2)
    # rotation exact, translation up to scale
    # unrefined 8-point estimate: ~0.5 deg noise floor (BA polishes later)
    np.testing.assert_allclose(T2[:3, :3], R, atol=2.5e-2)
    t_est = T2[:3, 3] / np.linalg.norm(T2[:3, 3])
    np.testing.assert_allclose(t_est, t_dir, atol=6e-2)
    # triangulated points correct up to the same scale
    good = np.asarray(res.good)
    assert good.sum() > 200
    X = np.asarray(res.points)[good]
    s = np.median(X[:, 2] / pts[good, 2])
    rel = np.linalg.norm(X / s - pts[good], axis=-1) / pts[good, 2]
    assert np.median(rel) < 0.05, np.median(rel)


def test_initializer_homography_path(rng):
    """Planar scene ⇒ H model selected and reconstructed."""
    cam = cam_mod.Camera.from_config(CAM)
    n = 300
    pts = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                    np.full(n, 10.0) + 0.2 * rng.uniform(-4, 4, n) * 0], -1)
    R = np.asarray(lie.so3_exp(jnp.asarray([0.03, -0.04, 0.02])))
    t = np.array([0.7, 0.1, 0.05])
    uv1 = pts[:, :2] / pts[:, 2:] * 450 + [320, 240]
    pc2 = pts @ R.T + t
    uv2 = pc2[:, :2] / pc2[:, 2:] * 450 + [320, 240]
    uv1 += rng.normal(0, 0.3, uv1.shape)
    uv2 += rng.normal(0, 0.3, uv2.shape)
    inb = ((uv2[:, 0] > 0) & (uv2[:, 0] < 640)
           & (uv2[:, 1] > 0) & (uv2[:, 1] < 480))
    res = initializer.initialize_mono(
        cam, jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
        jnp.asarray(inb), jax.random.PRNGKey(1))
    assert bool(res.used_h)
    assert bool(res.ok)
    T2 = np.asarray(res.Tcw2)
    np.testing.assert_allclose(T2[:3, :3], R, atol=4e-2)


@pytest.mark.slow
def test_mono_slam_sequence(rng):
    cfg = SlamConfig(
        camera=CAM,
        orb=OrbConfig(n_features=2000),  # mono init needs dense level-0 kps
        capacity=CapacityConfig(max_keyframes=64, max_map_points=1 << 14,
                                local_ba_keyframes=8, local_ba_points=2048),
        sensor=MONOCULAR)
    scene = synthetic.make_scene(rng, 1800, extent=(14.0, 9.0, 9.0),
                                 z_near=2.5)  # shallow, TUM-desk-like depth
    # sideways-dominant motion for initialization parallax
    n_frames = 25
    poses_gt = [synthetic.look_ahead_pose(
        np.array([0.3 * i, 0.0, 0.1 * i])) for i in range(n_frames)]
    eng = SlamEngine(cfg, enable_loop_closing=False)
    tracked = 0
    for i, T in enumerate(poses_gt):
        img = synthetic.render(scene, cfg.camera, T, rng, 1.0)
        out = eng.track_monocular(img, 0.1 * i)
        tracked += out is not None
    assert eng.state == tracking.OK, eng.stats
    assert tracked >= n_frames - 3, (tracked, eng.stats)

    # mono is up-to-scale+gauge: similarity-aligned ATE
    poses_est = eng.frame_poses()
    est_c, gt_c = [], []
    for Te, Tg, e in zip(poses_est, poses_gt,
                         eng.trajectory):
        if Te is None or e.lost:
            continue
        est_c.append(-Te[:3, :3].T @ Te[:3, 3])
        gt_c.append(-Tg[:3, :3].T @ Tg[:3, 3])
    # first frames before init aren't in the estimate; align what exists
    est_c, gt_c = np.asarray(est_c), np.asarray(gt_c[-len(est_c):])
    rmse = trajectory.ate_rmse(est_c, gt_c, align=True, with_scale=True)
    path_len = 0.32 * n_frames
    assert rmse < 0.03 * path_len, (rmse, eng.stats)


@pytest.mark.slow
def test_mono_windowed_engine(rng):
    """Monocular on the windowed engine: host-driven H/F bootstrap, then
    W-frames-per-dispatch tracking like stereo/RGBD (round-4 capability —
    the windowed engine previously rejected MONOCULAR)."""
    from orbslam2_tpu.runtime.windowed import WindowedSlamEngine

    cfg = SlamConfig(
        camera=CAM,
        orb=OrbConfig(n_features=2000),
        capacity=CapacityConfig(max_keyframes=64, max_map_points=1 << 14,
                                local_ba_keyframes=8, local_ba_points=2048),
        sensor=MONOCULAR)
    scene = synthetic.make_scene(rng, 1800, extent=(14.0, 9.0, 9.0),
                                 z_near=2.5)
    n_frames = 24
    poses_gt = [synthetic.look_ahead_pose(
        np.array([0.3 * i, 0.0, 0.1 * i])) for i in range(n_frames)]
    eng = WindowedSlamEngine(cfg, enable_loop_closing=False, window=4)
    for i, T in enumerate(poses_gt):
        img = synthetic.render(scene, cfg.camera, T, rng, 1.0)
        eng.track_monocular(img, 0.1 * i)
    eng.flush()
    assert eng.state == tracking.OK, eng.stats
    assert eng.stats["kf_inserted"] >= 3

    poses_est = eng.frame_poses()
    est_c, gt_c = [], []
    for Te, Tg, e in zip(poses_est, poses_gt, eng.trajectory):
        if Te is None or e.lost:
            continue
        est_c.append(-Te[:3, :3].T @ Te[:3, 3])
        gt_c.append(-Tg[:3, :3].T @ Tg[:3, 3])
    est_c, gt_c = np.asarray(est_c), np.asarray(gt_c[-len(est_c):])
    assert len(est_c) >= n_frames - 6
    rmse = trajectory.ate_rmse(est_c, gt_c, align=True, with_scale=True)
    path_len = 0.32 * n_frames
    assert rmse < 0.05 * path_len, (rmse, eng.stats)
