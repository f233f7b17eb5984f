"""Windowed SLAM engine (runtime/windowed.py): W frames per dispatch must
produce the same trajectory quality as the per-frame engine."""

import numpy as np
import pytest

from orbslam2_tpu.config import (CameraConfig, CapacityConfig, OrbConfig,
                                 STEREO, SlamConfig)
from orbslam2_tpu.runtime.windowed import WindowedSlamEngine
from orbslam2_tpu.utils import synthetic


def _cfg():
    return SlamConfig(
        camera=CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                            bf=150.0, width=640, height=480, fps=10.0,
                            th_depth=60.0),
        orb=OrbConfig(n_features=600),
        capacity=CapacityConfig(max_keyframes=32, max_map_points=1 << 13,
                                local_ba_keyframes=6, local_ba_points=1024),
        sensor=STEREO)


@pytest.mark.slow
def test_windowed_engine_tracks_world_sequence(rng):
    cfg = _cfg()
    world = synthetic.make_world(rng)
    n = 24
    poses = synthetic.straight_trajectory(n, step=0.3)
    frames = [synthetic.render_world_stereo(world, cfg.camera, T, rng, 1.0)
              for T in poses]
    eng = WindowedSlamEngine(cfg, enable_loop_closing=False, window=4)
    for i, (l, r) in enumerate(frames):
        eng.track_stereo(l, r, 0.1 * i)
    est = eng.frame_poses()          # flushes the tail
    assert len(est) == n
    errs = []
    for Te, Tg in zip(est, poses):
        assert Te is not None
        Ce = -Te[:3, :3].T @ Te[:3, 3]
        Cg = -Tg[:3, :3].T @ Tg[:3, 3]
        errs.append(np.linalg.norm(Ce - Cg))
    errs = np.asarray(errs)
    rmse = float(np.sqrt((errs ** 2).mean()))
    assert rmse < 0.15, (rmse, eng.stats)
    # keyframes inserted at a sane cadence (not per frame, not never)
    assert 3 <= eng.stats["kf_inserted"] <= n // 2, eng.stats
