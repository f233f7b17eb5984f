"""Replay-driver matrix: loaders + end-to-end runs on synthesized
dataset layouts (the reference's Test/Replay drivers, SURVEY.md §2.3).
Real datasets are absent on this machine, so each test writes the
driver's exact on-disk layout from the synthetic renderer first."""

import os

import numpy as np
import pytest

from orbslam2_tpu.config import (CameraConfig, CapacityConfig, OrbConfig,
                                 SlamConfig, STEREO)
from orbslam2_tpu.utils import synthetic
from orbslam2_tpu.utils.datasets import iter_ird_realsense, iter_isl_stereo

cv2 = pytest.importorskip("cv2")


def _cam():
    return CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=150.0,
                        width=640, height=480, fps=10.0, th_depth=60.0)


def _write_settings(path, cam, extra=""):
    path.write_text(f"""%YAML:1.0
Camera.fx: {cam.fx}
Camera.fy: {cam.fy}
Camera.cx: {cam.cx}
Camera.cy: {cam.cy}
Camera.bf: {cam.bf}
Camera.fps: {cam.fps}
Camera.width: {cam.width}
Camera.height: {cam.height}
ThDepth: {cam.th_depth}
DepthMapFactor: 1000.0
ORBextractor.nFeatures: 600
{extra}
""")


def test_isl_loader_and_replayer_sync(tmp_path, rng):
    """stereo_isl.cc layout: <stamp>_left.jpg / <stamp>_right.jpg + a
    nanosecond timestamp file; System constructed with replayer=true."""
    cam = _cam()
    world = synthetic.make_world(rng)
    poses = synthetic.straight_trajectory(8, step=0.3)
    ldir = tmp_path / "left"
    rdir = tmp_path / "right"
    ldir.mkdir()
    rdir.mkdir()
    stamps = []
    for i, T in enumerate(poses):
        l, r = synthetic.render_world_stereo(world, cam, T, rng, 1.0)
        s = str(1400000000000000000 + i * 100_000_000)
        stamps.append(s)
        cv2.imwrite(str(ldir / f"{s}_left.jpg"), l.astype(np.uint8))
        cv2.imwrite(str(rdir / f"{s}_right.jpg"), r.astype(np.uint8))
    times = tmp_path / "timestamps.txt"
    times.write_text("\n".join(stamps) + "\n")

    frames = list(iter_isl_stereo(str(ldir), str(rdir), str(times)))
    assert len(frames) == 8
    assert frames[0][0].shape == (480, 640)
    assert abs(frames[1][2] - frames[0][2] - 0.1) < 1e-6

    settings = tmp_path / "isl.yaml"
    _write_settings(settings, cam)
    from orbslam2_tpu.tools import replay as replay_mod
    traj = tmp_path / "traj.txt"
    rep = replay_mod.run_isl_stereo(str(ldir), str(rdir), str(times),
                                    str(settings), str(traj))
    assert rep.n_frames == 8
    assert rep.n_tracked >= 6
    assert traj.exists()


def test_ird_loader_and_replay(tmp_path, rng):
    """IRD realsense.cc layout: infrared/ + depth/ dirs, first two frames
    dropped, timestamps from depth filenames, depth resized to IR shape."""
    cam = _cam()
    world = synthetic.make_world(rng)
    poses = synthetic.straight_trajectory(10, step=0.3)
    ird = tmp_path / "seq" / "infrared"
    dd = tmp_path / "seq" / "depth"
    ird.mkdir(parents=True)
    dd.mkdir(parents=True)
    for i, T in enumerate(poses):
        ir, depth = synthetic.render_world(world, cam, T, rng, 1.0,
                                           with_depth=True)
        t = 1000.0 + 0.1 * i
        cv2.imwrite(str(ird / f"{t:.6f}.png"), ir.astype(np.uint8))
        # 16-bit depth in mm at HALF resolution (exercises the resize)
        d16 = np.clip(depth * 1000.0, 0, 65535).astype(np.uint16)[::2, ::2]
        cv2.imwrite(str(dd / f"{t:.6f}.png"), d16)

    frames = list(iter_ird_realsense(str(tmp_path / "seq")))
    assert len(frames) == 8                  # first two dropped
    ir0, d0, t0 = frames[0]
    assert d0.shape == ir0.shape             # resized to IR shape
    assert abs(t0 - 1000.2) < 1e-6
    assert 3.0 < np.median(d0[d0 > 0]) < 60.0   # metres after factor

    settings = tmp_path / "ird.yaml"
    _write_settings(settings, cam)
    from orbslam2_tpu.tools import replay as replay_mod
    traj = tmp_path / "traj.txt"
    rep = replay_mod.run_ird_realsense(str(tmp_path / "seq"), str(settings),
                                       str(traj), save_map=False)
    assert rep.n_frames == 8
    assert rep.n_tracked >= 6
    assert traj.exists()


def test_mono_runner_surface(tmp_path, rng):
    """mono_kitti/mono_euroc runners exist and consume their layouts (a
    2-frame smoke run; mono init needs a longer baseline, so only the
    plumbing is asserted here — full mono e2e lives in test_mono.py)."""
    cam = _cam()
    world = synthetic.make_world(rng)
    seq = tmp_path / "kitti" / "image_0"
    seq.mkdir(parents=True)
    (tmp_path / "kitti" / "image_1").mkdir()
    for i, T in enumerate(synthetic.straight_trajectory(2, step=0.3)):
        l, r = synthetic.render_world_stereo(world, cam, T, rng, 1.0)
        cv2.imwrite(str(seq / f"{i:06d}.png"), l.astype(np.uint8))
        cv2.imwrite(str(tmp_path / "kitti" / "image_1" / f"{i:06d}.png"),
                    r.astype(np.uint8))
    (tmp_path / "kitti" / "times.txt").write_text("0.0\n0.1\n")
    settings = tmp_path / "mono.yaml"
    _write_settings(settings, cam)
    from orbslam2_tpu.tools import replay as replay_mod
    rep = replay_mod.run_kitti_mono(str(tmp_path / "kitti"), str(settings),
                                    str(tmp_path / "kf.txt"))
    assert rep.n_frames == 2


def test_qrcode_replay(tmp_path):
    from orbslam2_tpu.tools import replay as replay_mod

    img = np.full((240, 320), 255, np.uint8)
    p = tmp_path / "frame.png"
    cv2.imwrite(str(p), img)
    out = tmp_path / "QRCodes.txt"
    tracker = replay_mod.run_qrcode_replay([str(p)], str(out))
    if tracker.available:
        assert out.exists()
