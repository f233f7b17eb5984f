"""End-to-end stereo SLAM slice on a synthetic sequence (the analogue of the
reference's replay drivers + ATE oracle, SURVEY.md §4)."""

import numpy as np
import pytest

from orbslam2_tpu.config import (CameraConfig, CapacityConfig, OrbConfig,
                                 STEREO, SlamConfig)
from orbslam2_tpu.runtime.slam import SlamEngine
from orbslam2_tpu.utils import synthetic


def make_cfg():
    return SlamConfig(
        camera=CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                            bf=150.0, width=640, height=480, fps=10.0,
                            th_depth=60.0),
        orb=OrbConfig(n_features=800),
        capacity=CapacityConfig(max_keyframes=64, max_map_points=1 << 14,
                                local_ba_keyframes=8, local_ba_points=2048),
        sensor=STEREO)


def ate_rmse(poses_est, poses_gt):
    """Absolute trajectory error of camera centers, no alignment (stereo has
    true scale and starts at identity)."""
    errs = []
    for Te, Tg in zip(poses_est, poses_gt):
        if Te is None:
            continue
        Ce = -Te[:3, :3].T @ Te[:3, 3]
        Cg = -Tg[:3, :3].T @ Tg[:3, 3]
        errs.append(np.sum((Ce - Cg) ** 2))
    assert len(errs) > 0
    return float(np.sqrt(np.mean(errs))), len(errs)


@pytest.mark.slow
def test_stereo_slam_straight_line(rng):
    cfg = make_cfg()
    scene = synthetic.make_scene(rng, 900, extent=(14.0, 9.0, 40.0),
                                 z_near=3.0)
    n_frames = 30
    poses_gt = synthetic.straight_trajectory(n_frames, step=0.25)
    eng = SlamEngine(cfg)
    for i, Tgt in enumerate(poses_gt):
        left, right = synthetic.render_stereo(scene, cfg.camera, Tgt, rng,
                                              noise=1.0)
        eng.track_stereo(left, right, timestamp=0.1 * i)

    assert eng.state == 2  # OK — never lost
    assert eng.n_kfs >= 2, eng.stats
    poses_est = eng.frame_poses()
    n_tracked = sum(p is not None for p in poses_est)
    assert n_tracked == n_frames

    rmse, n = ate_rmse(poses_est, poses_gt)
    # 7.5 m of motion; demand sub-2% ATE for the BA-corrected trajectory
    assert rmse < 0.15, (rmse, eng.stats)

    pts = eng.map_points()
    assert len(pts) > 300
    # map points should lie near true landmarks
    d = np.linalg.norm(pts[:, None, :] - scene.points[None, :, :], axis=-1)
    nearest = d.min(axis=1)
    assert np.median(nearest) < 0.8, np.median(nearest)  # stereo depth sigma ~0.8 m at the 20 m cutoff
