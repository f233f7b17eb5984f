"""Grabbers (Tools/Grab*) + ROS adapters (Test/Replay/ROS) — the
callback/decoding layers run without hardware or a ROS install."""

import os
import types

import numpy as np
import pytest

from orbslam2_tpu.config import (CameraConfig, CapacityConfig, OrbConfig,
                                 RGBD, STEREO, SlamConfig)
from orbslam2_tpu.runtime.ros_node import (RosMonoNode, RosRgbdNode,
                                           RosStereoNode, decode_image_msg)
from orbslam2_tpu.runtime.system import System
from orbslam2_tpu.utils import synthetic


def _cfg(sensor):
    return SlamConfig(
        camera=CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                            bf=150.0, width=640, height=480, fps=10.0,
                            th_depth=60.0),
        orb=OrbConfig(n_features=400),
        capacity=CapacityConfig(max_keyframes=16, max_map_points=4096,
                                local_ba_keyframes=4, local_ba_points=1024),
        sensor=sensor)


def _msg(img: np.ndarray, encoding: str, t: float):
    """Duck-typed sensor_msgs/Image."""
    h, w = img.shape[:2]
    if encoding in ("mono8", "8UC1"):
        data = img.astype(np.uint8).tobytes()
        step = w
    elif encoding in ("rgb8", "bgr8"):
        data = img.astype(np.uint8).tobytes()
        step = 3 * w
    elif encoding in ("mono16", "16UC1"):
        data = img.astype(np.uint16).tobytes()
        step = 2 * w
    else:
        data = img.astype(np.float32).tobytes()
        step = 4 * w
    stamp = types.SimpleNamespace(secs=int(t), nsecs=int((t % 1) * 1e9))
    return types.SimpleNamespace(
        height=h, width=w, encoding=encoding, data=data, step=step,
        header=types.SimpleNamespace(stamp=stamp))


def test_decode_encodings(rng):
    img = rng.uniform(0, 255, (8, 6)).astype(np.uint8)
    np.testing.assert_allclose(decode_image_msg(_msg(img, "mono8", 0)), img)
    d16 = (rng.uniform(0, 5000, (8, 6))).astype(np.uint16)
    np.testing.assert_allclose(decode_image_msg(_msg(d16, "16UC1", 0)), d16)
    f32 = rng.uniform(0, 5, (8, 6)).astype(np.float32)
    np.testing.assert_allclose(decode_image_msg(_msg(f32, "32FC1", 0)), f32)
    rgb = rng.uniform(0, 255, (8, 6, 3)).astype(np.uint8)
    g = decode_image_msg(_msg(rgb, "rgb8", 0))
    exp = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])
    np.testing.assert_allclose(g, exp, atol=1e-3)
    b = decode_image_msg(_msg(rgb, "bgr8", 0))
    expb = (0.299 * rgb[..., 2] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 0])
    np.testing.assert_allclose(b, expb, atol=1e-3)


@pytest.mark.slow
def test_ros_stereo_callback_tracks(rng):
    sys_ = System(None, None, sensor=STEREO, config=_cfg(STEREO))
    node = RosStereoNode(sys_)
    world = synthetic.make_world(rng)
    out = None
    for i, T in enumerate(synthetic.straight_trajectory(4, step=0.3)):
        l, r = synthetic.render_world_stereo(
            world, sys_.cfg.camera, T, rng, 1.0)
        out = node.callback(_msg(l.astype(np.uint8), "mono8", 0.1 * i),
                            _msg(r.astype(np.uint8), "mono8", 0.1 * i))
    assert out is not None
    assert sys_.engine.n_kfs >= 1


@pytest.mark.slow
def test_ros_rgbd_callback_with_mm_depth(rng):
    cfg = _cfg(RGBD)
    sys_ = System(None, None, sensor=RGBD, config=cfg)
    node = RosRgbdNode(sys_, depth_factor=1000.0)
    world = synthetic.make_world(rng)
    out = None
    for i, T in enumerate(synthetic.straight_trajectory(3, step=0.3)):
        gray, depth = synthetic.render_world(world, cfg.camera, T, rng, 1.0,
                                             with_depth=True)
        d16 = np.clip(depth * 1000.0, 0, 65535).astype(np.uint16)
        out = node.callback(_msg(gray.astype(np.uint8), "mono8", 0.1 * i),
                            _msg(d16, "16UC1", 0.1 * i))
    assert out is not None
    assert sys_.engine.n_kfs >= 1


def test_grabbers_roundtrip(tmp_path, rng):
    """Grab an IRD sequence from synthetic sources and replay it through
    the IRD loader — the recorder and the replayer agree on the layout."""
    import sys as _sys
    _sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "grab"))
    import grab as grab_mod
    from orbslam2_tpu.utils.datasets import iter_ird_realsense

    pytest.importorskip("cv2")
    cam = _cfg(RGBD).camera
    world = synthetic.make_world(rng)
    poses = synthetic.straight_trajectory(6, step=0.3)
    frames = [synthetic.render_world(world, cam, T, rng, 1.0,
                                     with_depth=True) for T in poses]
    state = {"i": 0}

    def ir_src():
        i = state["i"]
        if i >= len(frames):
            return None
        return frames[i][0], 100.0 + 0.1 * i

    def d_src():
        i = state["i"]
        if i >= len(frames):
            return None
        state["i"] += 1
        return frames[i][1], 100.0 + 0.1 * i

    n = grab_mod.grab_ird_sequence(ir_src, d_src, str(tmp_path / "seq"),
                                   n_frames=10)
    assert n == 6
    back = list(iter_ird_realsense(str(tmp_path / "seq")))
    assert len(back) == 4                      # loader drops first two
    ir0, d0, t0 = back[0]
    assert abs(t0 - 100.2) < 1e-6
    assert 3.0 < np.median(d0[d0 > 0]) < 60.0

    # calibration stills
    state2 = {"i": 0}

    def mono_src():
        i = state2["i"]
        if i >= 12:
            return None
        state2["i"] += 1
        return frames[i % len(frames)][0], float(i)

    w = grab_mod.grab_calibration_stills(mono_src, str(tmp_path / "calib"),
                                         n_frames=3, every=4)
    assert w == 3
    assert len(os.listdir(tmp_path / "calib")) == 3


@pytest.mark.slow
def test_ros_mono_ar_node(rng):
    """ros_mono_ar.cc: mono tracking + AR cube overlay on the image
    topic (menu: Insert Cube anchors on a detected map plane)."""
    from orbslam2_tpu.runtime.ros_node import RosMonoARNode
    from orbslam2_tpu.config import MONOCULAR

    sys_ = System(None, None, sensor=MONOCULAR, config=_cfg(MONOCULAR))
    published = []
    node = RosMonoARNode(sys_, publish_fn=published.append)
    world = synthetic.make_world(rng)
    out = None
    for i, T in enumerate(synthetic.straight_trajectory(10, step=0.35)):
        img = synthetic.render_world(world, sys_.cfg.camera, T, rng, 1.0)
        out = node.callback(_msg(img.astype(np.uint8), "mono8", 0.1 * i))
    assert out is not None and out.shape == img.shape
    assert len(published) == 10
    if sys_.engine.n_live_points > 100:         # map dense enough
        assert node.insert_cube()
        before = out.copy()
        out2 = node.callback(_msg(img.astype(np.uint8), "mono8", 1.1))
        # the cube overlay must actually draw on the frame
        assert out2 is not None
        node.clear_cubes()
