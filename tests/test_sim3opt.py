"""SearchBySim3 + OptimizeSim3 (ops/sim3opt.py) — the loop-closing
acceptance math (reference ORBmatcher.cc:1098-1229, Optimizer.cc:1090-1285).

Covers the VERDICT r2 acceptance criteria: a Horn/RANSAC estimate ≥ 2° off
is recovered to sub-0.2°, and a false loop (random correspondences) is
rejected by the optimized-inlier count.
"""

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.ops import sim3opt
from orbslam2_tpu.utils import camera as cam_mod, lie
from orbslam2_tpu.config import CameraConfig


def _cam():
    return cam_mod.Camera.from_config(CameraConfig(
        fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=150.0,
        width=640, height=480))


def _axis_angle(deg, axis):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    return lie.so3_exp(jnp.asarray(np.radians(deg) * axis, jnp.float32))


def _scene(rng, n=200):
    p1c = np.stack([
        rng.uniform(-4, 4, n), rng.uniform(-3, 3, n), rng.uniform(4, 12, n),
    ], axis=-1).astype(np.float32)
    return jnp.asarray(p1c)


def _project(cam, p):
    z = jnp.maximum(p[..., 2], 1e-6)
    return jnp.stack([cam.fx * p[..., 0] / z + cam.cx,
                      cam.fy * p[..., 1] / z + cam.cy], axis=-1)


def test_optimize_sim3_recovers_perturbed_estimate(rng):
    cam = _cam()
    p1c = _scene(rng)
    n = p1c.shape[0]
    # ground-truth S12 (cam2 → cam1): 10° rotation + translation + scale
    R12 = _axis_angle(10.0, [0.3, 1.0, 0.2])
    t12 = jnp.asarray([0.4, -0.2, 0.3], jnp.float32)
    s12 = jnp.float32(1.15)
    s21, R21, t21 = lie.sim3_inv(s12, R12, t12)
    p2c = s21 * (p1c @ R21.T) + t21

    uv1 = _project(cam, p1c) + jnp.asarray(
        rng.normal(0, 0.3, (n, 2)), jnp.float32)
    uv2 = _project(cam, p2c) + jnp.asarray(
        rng.normal(0, 0.3, (n, 2)), jnp.float32)
    inv_s2 = jnp.ones((n,), jnp.float32)

    # initial estimate 3° / 0.3 m / 8% scale off
    R0 = _axis_angle(3.0, [1.0, -0.5, 0.2]) @ R12
    t0 = t12 + jnp.asarray([0.2, 0.1, -0.2], jnp.float32)
    s0 = s12 * 1.08
    res = sim3opt.optimize_sim3(
        cam, p1c, p2c, uv1, uv2, inv_s2, inv_s2,
        jnp.ones((n,), bool), s0, R0, t0, fix_scale=False)

    dR = np.asarray(res.R12) @ np.asarray(R12).T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.2, f"rotation error {ang:.3f} deg"
    assert abs(float(res.s12) / float(s12) - 1.0) < 0.01
    np.testing.assert_allclose(np.asarray(res.t12), np.asarray(t12),
                               atol=0.05)
    assert int(res.n_inliers) > 0.9 * n


def test_optimize_sim3_fix_scale(rng):
    cam = _cam()
    p1c = _scene(rng)
    n = p1c.shape[0]
    R12 = _axis_angle(5.0, [0, 1, 0])
    t12 = jnp.asarray([0.5, 0.0, 0.1], jnp.float32)
    s12 = jnp.float32(1.0)
    s21, R21, t21 = lie.sim3_inv(s12, R12, t12)
    p2c = s21 * (p1c @ R21.T) + t21
    uv1, uv2 = _project(cam, p1c), _project(cam, p2c)
    inv_s2 = jnp.ones((n,), jnp.float32)
    R0 = _axis_angle(2.5, [0.2, 0.9, -0.1]) @ R12
    res = sim3opt.optimize_sim3(
        cam, p1c, p2c, uv1, uv2, inv_s2, inv_s2,
        jnp.ones((n,), bool), jnp.float32(1.0), R0, t12 + 0.1,
        fix_scale=True)
    assert float(res.s12) == 1.0          # stereo: scale stays pinned
    dR = np.asarray(res.R12) @ np.asarray(R12).T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.2


def test_optimize_sim3_rejects_false_loop(rng):
    """Random correspondences (a wrong loop candidate) must not reach the
    ≥20-optimized-inlier acceptance bar (LoopClosing.cc:359-370)."""
    cam = _cam()
    p1c = _scene(rng)
    n = p1c.shape[0]
    p2c = _scene(np.random.default_rng(99))      # unrelated geometry
    uv1 = _project(cam, p1c)
    uv2 = _project(cam, p2c[rng.permutation(n)])  # scrambled observations
    inv_s2 = jnp.ones((n,), jnp.float32)
    res = sim3opt.optimize_sim3(
        cam, p1c, p2c, uv1, uv2, inv_s2, inv_s2,
        jnp.ones((n,), bool), jnp.float32(1.0), jnp.eye(3), jnp.zeros(3),
        fix_scale=True)
    assert int(res.n_inliers) < 20


def test_search_by_sim3_two_way(rng):
    """Under the true Sim3, two-way guided matching recovers the
    correspondence between two keyframes' feature sets."""
    cam = _cam()
    n = 128
    p1c = _scene(rng, n)
    R12 = _axis_angle(8.0, [0.1, 1.0, 0.0])
    t12 = jnp.asarray([0.3, 0.1, 0.2], jnp.float32)
    s12 = jnp.float32(1.0)
    s21, R21, t21 = lie.sim3_inv(s12, R12, t12)
    perm = rng.permutation(n)
    p2c = (s21 * (p1c @ R21.T) + t21)[perm]

    uv1 = _project(cam, p1c)
    uv2 = _project(cam, p2c)
    desc1 = jnp.asarray(
        rng.integers(0, 2**32, (n, 8), dtype=np.uint64).astype(np.uint32))
    desc2 = desc1[perm]
    lvl = jnp.zeros((n,), jnp.int32)
    valid = jnp.ones((n,), bool)
    dist1 = jnp.linalg.norm(p1c, axis=-1)
    dist2 = jnp.linalg.norm(p2c, axis=-1)

    m12, n_match = sim3opt.search_by_sim3(
        cam, uv1, lvl, desc1, valid, p1c, valid,
        uv2, lvl, desc2, valid, p2c, valid,
        # max_dist ≈ observation distance (level-0 detection semantics)
        0.3 * dist1, 1.02 * dist1, 0.3 * dist2, 1.02 * dist2,
        s12, R12, t12, 1.2, 8)
    m12 = np.asarray(m12)
    ok = m12 >= 0
    # every recovered match is the permutation's truth, and the two-way
    # agreement recovers a healthy share of the correspondences
    inv_perm = np.empty(n, int)
    inv_perm[perm] = np.arange(n)
    assert ok.sum() >= 40
    np.testing.assert_array_equal(m12[ok], inv_perm[ok])
