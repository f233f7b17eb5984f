"""Lie-group ops vs scipy.spatial.transform as oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from orbslam2_tpu.utils import lie

jax.config.update("jax_enable_x64", False)


def random_rotvecs(rng, n, max_angle=3.0):
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = rng.uniform(0.0, max_angle, size=(n, 1))
    return axes * angles


def test_so3_exp_matches_scipy(rng):
    w = random_rotvecs(rng, 64)
    R = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_exp_small_angle(rng):
    w = rng.normal(size=(16, 3)) * 1e-6
    R = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-6)


def test_so3_log_roundtrip(rng):
    w = random_rotvecs(rng, 64, max_angle=3.0)
    R = Rotation.from_rotvec(w).as_matrix()
    w_back = np.asarray(lie.so3_log(jnp.asarray(R, jnp.float32)))
    np.testing.assert_allclose(w_back, w, atol=2e-4)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(32, 6)).astype(np.float32)
    xi[:, :3] = random_rotvecs(rng, 32, max_angle=2.5)
    T = lie.se3_exp(jnp.asarray(xi))
    xi_back = np.asarray(lie.se3_log(T))
    np.testing.assert_allclose(xi_back, xi, atol=5e-4)


def test_se3_inv(rng):
    xi = rng.normal(size=(8, 6)).astype(np.float32)
    T = lie.se3_exp(jnp.asarray(xi))
    eye = np.asarray(T @ lie.se3_inv(T))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), (8, 4, 4)),
                               atol=1e-5)


def test_quat_roundtrip(rng):
    w = random_rotvecs(rng, 128, max_angle=3.1)
    R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
    q = np.asarray(lie.quat_from_mat(jnp.asarray(R)))
    # scipy uses (x, y, z, w) too
    q_ref = Rotation.from_rotvec(w).as_quat()
    # allow sign flip
    sign = np.sign(np.sum(q * q_ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(q * sign, q_ref, atol=1e-4)
    R_back = np.asarray(lie.mat_from_quat(jnp.asarray(q)))
    np.testing.assert_allclose(R_back, R, atol=1e-5)


def test_euler_from_quat(rng):
    w = random_rotvecs(rng, 32, max_angle=1.2)
    rot = Rotation.from_rotvec(w)
    q = rot.as_quat().astype(np.float32)
    eul = np.asarray(lie.euler_from_quat(jnp.asarray(q)))
    eul_ref = rot.as_euler("xyz")  # roll, pitch, yaw (intrinsic xyz)
    np.testing.assert_allclose(eul, eul_ref, atol=1e-4)


def test_sim3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(32, 7)).astype(np.float32) * 0.5
    xi[:, :3] = random_rotvecs(rng, 32, max_angle=2.0)
    s, R, t = lie.sim3_exp(jnp.asarray(xi))
    xi_back = np.asarray(lie.sim3_log(s, R, t))
    np.testing.assert_allclose(xi_back, xi, atol=2e-3)


def test_sim3_identity():
    xi = jnp.zeros((7,), jnp.float32)
    s, R, t = lie.sim3_exp(xi)
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-6)


def test_sim3_mul_inv(rng):
    xi = rng.normal(size=(8, 7)).astype(np.float32) * 0.4
    s, R, t = lie.sim3_exp(jnp.asarray(xi))
    si, Ri, ti = lie.sim3_inv(s, R, t)
    se, Re, te = lie.sim3_mul(s, R, t, si, Ri, ti)
    np.testing.assert_allclose(np.asarray(se), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Re),
                               np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(te), 0.0, atol=1e-5)


def test_sim3_apply_consistency(rng):
    """sim3_to_mat applied as matrix == sim3_apply."""
    xi = rng.normal(size=(7,)).astype(np.float32) * 0.5
    s, R, t = lie.sim3_exp(jnp.asarray(xi))
    pts = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    a = lie.sim3_apply(s, R, t, pts)
    T = lie.sim3_to_mat(s, R, t)
    b = lie.transform_points(T, pts)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_transform_points(rng):
    xi = rng.normal(size=(6,)).astype(np.float32)
    T = lie.se3_exp(jnp.asarray(xi))
    pts = rng.normal(size=(17, 3)).astype(np.float32)
    out = np.asarray(lie.transform_points(T, jnp.asarray(pts)))
    Tn = np.asarray(T)
    ref = (Tn[:3, :3] @ pts.T).T + Tn[:3, 3]
    np.testing.assert_allclose(out, ref, atol=1e-5)
