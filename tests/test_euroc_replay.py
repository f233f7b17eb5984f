"""End-to-end EuRoC replay through stereo rectification.

The reference's stereo_euroc.cc pipeline: raw (distorted, unrectified)
cam0/cam1 frames → initUndistortRectifyMap + remap → System::TrackStereo
with Config/Stereo-EuRoC.yaml.  No EuRoC data ships with this machine
(SURVEY.md §4), so the fixture is synthesized to the same contract:

  1. render ideal RECTIFIED pinhole pairs of a textured world with the
     yaml's Camera.* intrinsics (what a perfectly rectified EuRoC frame
     looks like),
  2. warp them into RAW camera frames by the inverse of the rectification
     (per raw pixel: undistort through LEFT./RIGHT. K,D, rotate by R,
     project by P, sample the rectified render) — cv2.undistortPoints is
     the oracle for this inverse,
  3. write a MAV-layout directory (cam0/data/<ns>.png) and run the real
     replay driver with the UNCHANGED reference yaml.

Passing means: yaml parsing, map build, per-frame remap, frontend,
tracking and trajectory export all compose on EuRoC's real calibration.
"""

import os

import numpy as np
import pytest

from orbslam2_tpu.config import _parse_opencv_yaml
from orbslam2_tpu.ops import rectify

EUROC_YAML = "/root/reference/Config/Stereo-EuRoC.yaml"

cv2 = pytest.importorskip("cv2")
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.exists(EUROC_YAML),
                       reason="reference configs not present"),
]


def _raw_from_rectified(rect_img: np.ndarray, K, D, R, P, w, h):
    """Inverse of the rectification warp: build the raw camera frame whose
    remap() reproduces ``rect_img``."""
    u, v = np.meshgrid(np.arange(w, dtype=np.float64),
                       np.arange(h, dtype=np.float64))
    pts = np.stack([u.reshape(-1), v.reshape(-1)], -1)[:, None, :]
    # raw pixel → rectified pixel coordinates
    out = cv2.undistortPoints(pts.astype(np.float32), np.asarray(K),
                              np.asarray(D), R=np.asarray(R),
                              P=np.asarray(P)[:3, :3])
    mx = out[:, 0, 0].reshape(h, w).astype(np.float32)
    my = out[:, 0, 1].reshape(h, w).astype(np.float32)
    return cv2.remap(rect_img.astype(np.float32), mx, my, cv2.INTER_LINEAR)


def test_euroc_replay_e2e(tmp_path, rng):
    from orbslam2_tpu.config import SlamConfig, STEREO
    from orbslam2_tpu.utils import synthetic

    with open(EUROC_YAML) as f:
        flat = _parse_opencv_yaml(f.read())
    cfg = SlamConfig.from_yaml(EUROC_YAML, sensor=STEREO)
    cam = cfg.camera
    assert cam.width == 752 and cam.height == 480
    w, h = cam.width, cam.height

    world = synthetic.make_world(rng)
    n = 10
    poses = synthetic.straight_trajectory(n, step=0.3)

    cam0 = tmp_path / "mav" / "cam0" / "data"
    cam1 = tmp_path / "mav" / "cam1" / "data"
    cam0.mkdir(parents=True)
    cam1.mkdir(parents=True)
    for i, T in enumerate(poses):
        left, right = synthetic.render_world_stereo(world, cam, T, rng,
                                                    noise=1.0)
        raw_l = _raw_from_rectified(
            left, flat["LEFT.K"], flat["LEFT.D"], flat["LEFT.R"],
            flat["LEFT.P"], w, h)
        raw_r = _raw_from_rectified(
            right, flat["RIGHT.K"], flat["RIGHT.D"], flat["RIGHT.R"],
            flat["RIGHT.P"], w, h)
        ns = 1403636579763555584 + i * 50_000_000      # EuRoC-style stamp
        cv2.imwrite(str(cam0 / f"{ns}.png"), raw_l.astype(np.uint8))
        cv2.imwrite(str(cam1 / f"{ns}.png"), raw_r.astype(np.uint8))

    # roundtrip sanity: our remap of the synthesized raw frame recovers the
    # rectified render (interior pixels; both warps are bilinear)
    rect = rectify.load_rectification(flat)
    left, right = synthetic.render_world_stereo(world, cam, poses[0], rng,
                                                noise=0.0)
    raw_l = _raw_from_rectified(left, flat["LEFT.K"], flat["LEFT.D"],
                                flat["LEFT.R"], flat["LEFT.P"], w, h)
    back_l, _ = rect(raw_l, raw_l)
    interior = np.zeros((h, w), bool)
    interior[40:-40, 60:-60] = True
    valid = interior & (back_l > 0)
    err = np.abs(back_l - left)[valid]
    assert np.median(err) < 8.0, np.median(err)

    from orbslam2_tpu.tools import replay as replay_mod
    traj = tmp_path / "traj.txt"
    rep = replay_mod.run_euroc_stereo(str(tmp_path / "mav"), EUROC_YAML,
                                      None, str(traj), None, False)
    assert rep.n_frames == n
    assert rep.n_tracked >= n - 2, rep.n_tracked
    lines = [ln for ln in traj.read_text().splitlines() if ln.strip()]
    assert len(lines) >= n - 2
    # forward motion along +z must be recovered (up to small error)
    first = np.array([float(x) for x in lines[0].split()][1:4])
    last = np.array([float(x) for x in lines[-1].split()][1:4])
    dist = np.linalg.norm(last - first)
    expect = 0.3 * (n - 1)
    assert abs(dist - expect) < 0.3 * expect, (dist, expect)
