"""Camera model vs OpenCV as oracle (cv2 is test-only, never a runtime dep)."""

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.config import CameraConfig
from orbslam2_tpu.utils import camera as cam_mod
from orbslam2_tpu.utils import lie

cv2 = pytest.importorskip("cv2")

CFG = CameraConfig(fx=458.654, fy=457.296, cx=367.215, cy=248.375,
                   k1=-0.28340811, k2=0.07395907, p1=0.00019359,
                   p2=1.76187114e-05, k3=0.0, bf=47.906, width=752, height=480)


def make_cam():
    return cam_mod.Camera.from_config(CFG)


def test_project_backproject_roundtrip(rng):
    cam = make_cam()
    pts = rng.uniform([-2, -2, 0.5], [2, 2, 10], size=(100, 3)).astype(np.float32)
    uv = cam_mod.project(cam, jnp.asarray(pts))
    back = cam_mod.backproject(cam, uv, jnp.asarray(pts[:, 2]))
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)


def test_undistort_matches_opencv(rng):
    # interior points, where cv2's own fixed-point loop has converged
    cam = make_cam()
    uv = rng.uniform([150, 120], [600, 360], size=(200, 2)).astype(np.float32)
    K = np.array([[CFG.fx, 0, CFG.cx], [0, CFG.fy, CFG.cy], [0, 0, 1]], np.float64)
    D = np.array([CFG.k1, CFG.k2, CFG.p1, CFG.p2, CFG.k3], np.float64)
    ref = cv2.undistortPoints(uv.reshape(-1, 1, 2).astype(np.float64), K, D,
                              P=K).reshape(-1, 2)
    out = np.asarray(cam_mod.undistort_points(cam, jnp.asarray(uv)))
    np.testing.assert_allclose(out, ref, atol=0.05)  # sub-1/20-pixel


def test_undistort_is_true_inverse(rng):
    # stronger check than matching cv2: distort(undistort(x)) == x everywhere
    cam = make_cam()
    uv = rng.uniform([5, 5], [745, 475], size=(300, 2)).astype(np.float32)
    und = cam_mod.undistort_points(cam, jnp.asarray(uv))
    back = cam_mod.distort_points(cam, und)
    np.testing.assert_allclose(np.asarray(back), uv, atol=5e-3)


def test_distort_undistort_roundtrip(rng):
    cam = make_cam()
    uv = rng.uniform([100, 100], [650, 380], size=(50, 2)).astype(np.float32)
    dist = cam_mod.distort_points(cam, jnp.asarray(uv))
    und = cam_mod.undistort_points(cam, dist)
    np.testing.assert_allclose(np.asarray(und), uv, atol=0.02)


def test_stereo_projection():
    cam = make_cam()
    pts = jnp.asarray([[0.5, 0.2, 5.0]], jnp.float32)
    uvr = cam_mod.project_stereo(cam, pts)
    disparity = uvr[0, 0] - uvr[0, 2]
    np.testing.assert_allclose(float(disparity), CFG.bf / 5.0, rtol=1e-5)


def test_in_frustum(rng):
    cam = make_cam()
    Tcw = lie.se3_exp(jnp.zeros(6, jnp.float32))
    pts = jnp.asarray([[0.0, 0.0, 5.0],     # visible, on axis
                       [0.0, 0.0, -5.0],    # behind
                       [100.0, 0.0, 1.0]],  # off image
                      jnp.float32)
    normal = jnp.asarray([[0, 0, 1.0]] * 3, jnp.float32)
    ok, uv, ur, dist, viewcos = cam_mod.in_frustum(
        cam, Tcw, pts, jnp.asarray([0.1] * 3), jnp.asarray([100.0] * 3), normal)
    assert np.asarray(ok).tolist() == [True, False, False]
    np.testing.assert_allclose(np.asarray(uv[0]), [CFG.cx, CFG.cy], atol=1e-3)


def test_image_bounds_computed():
    cam = make_cam()
    # EuRoC's strong radial distortion expands the undistorted bounds
    assert float(cam.min_x) < 0.0
    assert float(cam.max_x) > CFG.width
