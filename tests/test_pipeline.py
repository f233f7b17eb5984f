"""Async tracking/mapping pipeline + native runtime primitives."""

import threading
import time

import numpy as np
import pytest

from orbslam2_tpu.config import (CameraConfig, CapacityConfig, OrbConfig,
                                 STEREO, SlamConfig)
from orbslam2_tpu.runtime import tracking
from orbslam2_tpu.runtime.native import InterruptFlag, StageTimer, TokenQueue
from orbslam2_tpu.runtime.pipeline import AsyncSlamEngine
from orbslam2_tpu.utils import synthetic


def test_native_queue_threads():
    q = TokenQueue(4)
    got = []

    def consumer():
        while True:
            t = q.pop(timeout_ms=2000)
            if t is None:
                return
            got.append(t)

    th = threading.Thread(target=consumer)
    th.start()
    for i in range(10):
        q.push(i)
    time.sleep(0.2)
    q.close()
    th.join(timeout=5)
    assert got == list(range(10))


def test_native_flag_and_timer():
    f = InterruptFlag()
    assert f.get() == 0
    f.set(2)
    assert f.consume() == 2
    assert f.get() == 0
    t = StageTimer()
    t.start()
    time.sleep(0.005)
    assert t.stop() >= 4.0
    assert t.count() == 1


def test_queue_push_latest_drops_oldest():
    q = TokenQueue(2)
    assert q.push_latest(1) is False
    assert q.push_latest(2) is False
    assert q.push_latest(3) is True  # dropped 1
    assert q.pop(10) == 2
    assert q.pop(10) == 3


@pytest.mark.slow
def test_async_engine_matches_sync(rng):
    cfg = SlamConfig(
        camera=CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                            bf=150.0, width=640, height=480, fps=10.0,
                            th_depth=60.0),
        orb=OrbConfig(n_features=600),
        capacity=CapacityConfig(max_keyframes=64, max_map_points=1 << 14,
                                local_ba_keyframes=8, local_ba_points=2048),
        sensor=STEREO)
    scene = synthetic.make_scene(rng, 900, extent=(14.0, 9.0, 40.0),
                                 z_near=3.0)
    poses_gt = synthetic.straight_trajectory(16, step=0.25)
    frames = [synthetic.render_stereo(scene, cfg.camera, T, rng, 1.0)
              for T in poses_gt]

    eng = AsyncSlamEngine(cfg, enable_loop_closing=False)
    eng.start()
    tracked = 0
    for i, (l, r) in enumerate(frames):
        out = eng.track_stereo(l, r, 0.1 * i)
        tracked += out is not None
    eng.shutdown()
    assert tracked == len(frames), eng.stats
    assert eng.state == tracking.OK
    assert eng.stats["kf_inserted"] >= 2, eng.stats
    # trajectory quality comparable to the sync engine's bound
    poses_est = eng.frame_poses()
    errs = []
    for Te, Tg in zip(poses_est, poses_gt):
        if Te is None:
            continue
        Ce = -Te[:3, :3].T @ Te[:3, 3]
        Cg = -Tg[:3, :3].T @ Tg[:3, 3]
        errs.append(np.sum((Ce - Cg) ** 2))
    rmse = float(np.sqrt(np.mean(errs)))
    assert rmse < 0.2, (rmse, eng.stats)
