"""System facade: API parity checks (map save/load, localization mode,
trajectory export, covariance, HPose, RGBD path)."""

import os

import numpy as np
import pytest

from orbslam2_tpu.config import (CameraConfig, CapacityConfig, OrbConfig,
                                 RGBD, STEREO, SlamConfig)
from orbslam2_tpu.models import vocabulary as voc_mod
from orbslam2_tpu.runtime import tracking
from orbslam2_tpu.runtime.system import System
from orbslam2_tpu.utils import synthetic
from orbslam2_tpu.utils.hpose import HPose


def make_cfg(sensor=STEREO):
    return SlamConfig(
        camera=CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                            bf=150.0, width=640, height=480, fps=10.0,
                            th_depth=60.0),
        orb=OrbConfig(n_features=600),
        capacity=CapacityConfig(max_keyframes=64, max_map_points=1 << 14,
                                local_ba_keyframes=8, local_ba_points=2048),
        sensor=sensor)


def render_depth(scene, cam_cfg, Tcw):
    """Dense synthetic depth image from sprite z-buffer (for RGBD tests)."""
    h, w = cam_cfg.height, cam_cfg.width
    depth = np.zeros((h, w), np.float32)
    pc = scene.points @ Tcw[:3, :3].T + Tcw[:3, 3]
    z = pc[:, 2]
    u = cam_cfg.fx * pc[:, 0] / np.where(z > 0.3, z, 1) + cam_cfg.cx
    v = cam_cfg.fy * pc[:, 1] / np.where(z > 0.3, z, 1) + cam_cfg.cy
    order = np.argsort(-z)
    r = scene.sprites.shape[1] // 2
    for i in order:
        if z[i] <= 0.3:
            continue
        x0, y0 = int(round(u[i])) - r, int(round(v[i])) - r
        s = scene.sprites.shape[1]
        if x0 < 0 or y0 < 0 or x0 + s > w or y0 + s > h:
            continue
        depth[y0:y0 + s, x0:x0 + s] = z[i]
    return depth


@pytest.mark.slow
def test_rgbd_tracking_and_exports(rng, tmp_path):
    cfg = make_cfg(RGBD)
    voc = voc_mod.default_vocabulary()
    scene = synthetic.make_scene(rng, 900, extent=(14.0, 9.0, 40.0),
                                 z_near=3.0)
    poses_gt = synthetic.straight_trajectory(10, step=0.25)
    sys = System(None, None, sensor=RGBD, config=cfg)
    sys.engine.loop_closer = None  # speed: no DB updates in this test
    for i, T in enumerate(poses_gt):
        img = synthetic.render(scene, cfg.camera, T, rng, 1.0)
        depth = render_depth(scene, cfg.camera, T)
        out = sys.track_rgbd(img, depth, 0.1 * i)
    assert sys.get_tracking_state() == tracking.OK
    assert out is not None
    # pose error small
    Ce = -out[:3, :3].T @ out[:3, 3]
    Cg = -poses_gt[-1][:3, :3].T @ poses_gt[-1][:3, 3]
    assert np.linalg.norm(Ce - Cg) < 0.3

    # exports
    tum = tmp_path / "traj.txt"
    sys.save_trajectory_tum(str(tum))
    lines = tum.read_text().strip().splitlines()
    assert len(lines) == 10 and len(lines[0].split()) == 8
    kitti = tmp_path / "kitti.txt"
    sys.save_trajectory_kitti(str(kitti))
    assert len(kitti.read_text().strip().splitlines()) == 10
    kf_tum = tmp_path / "kf.txt"
    sys.save_keyframe_trajectory_tum(str(kf_tum))
    assert len(kf_tum.read_text().strip().splitlines()) >= 1

    # covariance: 6×6 SPD-ish
    cov = sys.get_current_covariance()
    assert cov.shape == (6, 6)
    assert np.all(np.linalg.eigvalsh((cov + cov.T) / 2) > -1e-8)
    assert sys.get_map().shape[1] == 3


@pytest.mark.slow
def test_map_save_load_localization(rng, tmp_path):
    cfg = make_cfg(STEREO)
    voc = voc_mod.default_vocabulary()
    scene = synthetic.make_scene(rng, 900, extent=(14.0, 9.0, 40.0),
                                 z_near=3.0)
    poses_gt = synthetic.straight_trajectory(8, step=0.25)
    sys = System(None, None, sensor=STEREO, config=cfg)
    for i, T in enumerate(poses_gt):
        l, r = synthetic.render_stereo(scene, cfg.camera, T, rng, 1.0)
        sys.track_stereo(l, r, 0.1 * i)
    map_path = str(tmp_path / "map.npz")
    sys.save_map(map_path)

    # a fresh System that loads the map relocalizes in localization mode
    sys2 = System(None, None, sensor=STEREO,
                  config=cfg.replace(map_file=map_path))
    assert sys2.get_tracking_state() == tracking.LOST
    assert sys2.engine.localization_only
    T_back = poses_gt[3]
    l, r = synthetic.render_stereo(scene, cfg.camera, T_back, rng, 1.0)
    Tcw = sys2.track_stereo(l, r, 50.0)
    assert Tcw is not None, "relocalization against loaded map failed"
    Ce = -Tcw[:3, :3].T @ Tcw[:3, 3]
    Cg = -T_back[:3, :3].T @ T_back[:3, 3]
    assert np.linalg.norm(Ce - Cg) < 0.1
    # localization mode must not grow the map
    kfs_before = sys2.engine.n_kfs
    l, r = synthetic.render_stereo(
        scene, cfg.camera, poses_gt[4], rng, 1.0)
    sys2.track_stereo(l, r, 50.1)
    assert sys2.engine.n_kfs == kfs_before


def test_hpose_world_conversion():
    # camera at origin looking along +z: world frame puts x forward
    hp = HPose.from_Tcw(np.eye(4))
    wp = hp.to_world_frame()
    np.testing.assert_allclose(wp.position, 0.0, atol=1e-9)
    # camera moved 1m forward (+z in SLAM frame) → +x in world frame
    Tcw = np.eye(4)
    Tcw[2, 3] = -1.0  # t_cw = -R·C, C = (0,0,1)
    wp = HPose.from_Tcw(Tcw).to_world_frame()
    np.testing.assert_allclose(wp.position, [1.0, 0.0, 0.0], atol=1e-9)
    assert np.allclose(HPose().euler(), 0.0)


def test_change_calibration(tmp_path, rng):
    """Tracking::ChangeCalibration (Tracking.cc:1656): new intrinsics take
    effect while the map survives."""
    from orbslam2_tpu.config import (CameraConfig, CapacityConfig,
                                     OrbConfig, STEREO, SlamConfig)
    from orbslam2_tpu.runtime.system import System
    from orbslam2_tpu.utils import synthetic

    cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=150.0,
                       width=640, height=480, fps=10.0, th_depth=60.0)
    cfg = SlamConfig(
        camera=cam, orb=OrbConfig(n_features=400),
        capacity=CapacityConfig(max_keyframes=16, max_map_points=4096,
                                local_ba_keyframes=4, local_ba_points=1024),
        sensor=STEREO)
    sys_ = System(None, None, sensor=STEREO, config=cfg)
    world = synthetic.make_world(rng)
    poses = synthetic.straight_trajectory(8, step=0.3)
    for i in range(4):
        l, r = synthetic.render_world_stereo(world, cam, poses[i], rng, 1.0)
        sys_.track_stereo(l, r, 0.1 * i)
    kfs_before = sys_.engine.n_kfs
    assert kfs_before >= 1

    cam2 = CameraConfig(fx=455.0, fy=455.0, cx=318.0, cy=242.0, bf=151.0,
                        width=640, height=480, fps=10.0, th_depth=60.0)
    settings = tmp_path / "new.yaml"
    settings.write_text(f"""%YAML:1.0
Camera.fx: {cam2.fx}
Camera.fy: {cam2.fy}
Camera.cx: {cam2.cx}
Camera.cy: {cam2.cy}
Camera.bf: {cam2.bf}
Camera.fps: 10.0
Camera.width: 640
Camera.height: 480
ThDepth: 60.0
""")
    sys_.change_calibration(str(settings))
    assert sys_.cfg.camera.fx == 455.0
    assert sys_.engine.n_kfs == kfs_before          # map survived
    # tracking continues under the (slightly) new calibration
    for i in range(4, 8):
        l, r = synthetic.render_world_stereo(world, cam2, poses[i], rng, 1.0)
        out = sys_.track_stereo(l, r, 0.1 * i)
    assert out is not None
