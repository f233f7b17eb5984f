"""Live-driver loops (Test/Live/* equivalents) against synthetic
callable sources — the loops the reference wraps around cv2/librealsense
capture, hardware-free."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "live"))

from orbslam2_tpu.config import CameraConfig  # noqa: E402
from orbslam2_tpu.utils import synthetic  # noqa: E402


def _cam():
    return CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=150.0,
                        width=640, height=480, fps=10.0, th_depth=60.0)


def _settings(tmp_path, cam):
    p = tmp_path / "live.yaml"
    p.write_text(f"""%YAML:1.0
Camera.fx: {cam.fx}
Camera.fy: {cam.fy}
Camera.cx: {cam.cx}
Camera.cy: {cam.cy}
Camera.bf: {cam.bf}
Camera.fps: {cam.fps}
Camera.width: {cam.width}
Camera.height: {cam.height}
ThDepth: {cam.th_depth}
ORBextractor.nFeatures: 500
""")
    return str(p)


def _ird_source(frames):
    state = {"i": 0}

    def grab():
        i = state["i"]
        if i >= len(frames):
            return None
        state["i"] += 1
        ir, depth = frames[i]
        return ir, depth, 0.1 * i

    return grab


@pytest.mark.slow
def test_ird_live_and_multicam(tmp_path, rng):
    import live

    cam = _cam()
    world = synthetic.make_world(rng)
    poses = synthetic.straight_trajectory(8, step=0.3)
    frames = [synthetic.render_world(world, cam, T, rng, 1.0,
                                     with_depth=True) for T in poses]
    settings = _settings(tmp_path, cam)

    out = tmp_path / "traj.txt"
    n = live.run_ird_live(_ird_source(frames), settings, str(out),
                          save_map=False)
    assert n == 8
    assert len(out.read_text().splitlines()) >= 6

    # multicam: SLAM trajectory + the "T265" odometry log side by side
    odom_poses = iter(poses)

    def odom():
        return next(odom_poses, None)

    s_out = tmp_path / "d435i.txt"
    o_out = tmp_path / "t265.txt"
    n = live.run_multicam(_ird_source(frames), odom, settings,
                          str(s_out), str(o_out))
    assert n == 8
    assert len(s_out.read_text().splitlines()) >= 6
    assert len(o_out.read_text().splitlines()) == 8


@pytest.mark.slow
def test_uwb_fusion_log(tmp_path, rng):
    import live

    cam = _cam()
    world = synthetic.make_world(rng)
    poses = synthetic.straight_trajectory(6, step=0.3)
    frames = [synthetic.render_world(world, cam, T, rng, 1.0,
                                     with_depth=True) for T in poses]
    anchors = {1: np.array([0.0, 0.0, 0.0]),
               2: np.array([5.0, 0.0, 10.0]),
               3: np.array([-5.0, 2.0, 20.0])}
    log = tmp_path / "uwb.txt"
    n = live.run_uwb(_ird_source(frames), _settings(tmp_path, cam),
                     anchors, str(log))
    assert n == 6
    lines = [ln.split() for ln in log.read_text().splitlines()]
    assert len(lines) >= 4
    assert len(lines[0]) == 1 + 3 + 3          # t, pos, 3 ranges
    # ranges are consistent with the logged position (5 cm sim noise)
    t, x, y, z, r1, r2, r3 = map(float, lines[-1])
    pos = np.array([x, y, z])
    for r, aid in zip((r1, r2, r3), (1, 2, 3)):
        assert abs(r - np.linalg.norm(anchors[aid] - pos)) < 0.5


def test_uwb_bias_characterization():
    """UWB/uwb_bias.cc: per ground-truth distance, average n valid
    readings (>= 800 cm rejected) into (true, measured) rows."""
    import io

    import live
    from orbslam2_tpu.utils.sensors import UwbNode

    node = UwbNode(node_id=0, anchors={1: np.zeros(3)}, noise_m=0.03,
                   seed=7)
    buf = io.StringIO()
    rows = live.run_uwb_bias(node, target_id=1,
                             true_distances_cm=[100, 250, 400, -1, 999],
                             n_measurements=50, out=buf)
    assert len(rows) == 3                       # -1 stops the loop
    for true_cm, avg_cm in rows:
        assert abs(avg_cm - true_cm) < 3.0      # 3 cm sim noise, n=50
    assert len(buf.getvalue().splitlines()) == 3
