"""BoW vocabulary, keyframe DB, EPnP, and Sim3 solver tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.config import CameraConfig
from orbslam2_tpu.models import vocabulary as voc_mod
from orbslam2_tpu.ops import bow, horn, pnp, sim3solver
from orbslam2_tpu.utils import camera as cam_mod
from orbslam2_tpu.utils import lie

CAM = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=150.0)


def random_desc(rng, n):
    return rng.integers(0, 2 ** 32, size=(n, 8), dtype=np.uint32)


def perturb_desc(rng, desc, n_bits):
    """Flip n_bits random bits per descriptor."""
    out = desc.copy()
    for i in range(len(out)):
        words = rng.integers(0, 8, n_bits)
        bits = rng.integers(0, 32, n_bits)
        for w, b in zip(words, bits):
            out[i, w] ^= np.uint32(1 << b)
    return out


def test_vocabulary_build_and_transform(rng):
    train = random_desc(rng, 3000)
    voc = voc_mod.build_vocabulary(train, k=5, levels=2)
    assert voc.n_words == 25
    d = jnp.asarray(train[:100])
    words = np.asarray(bow.descriptors_to_words(
        voc, d, jnp.ones(100, bool)))
    assert words.min() >= 0 and words.max() < 25
    # same descriptor → same word; slightly perturbed → usually same word
    pert = jnp.asarray(perturb_desc(rng, train[:100], 8))
    words2 = np.asarray(bow.descriptors_to_words(
        voc, pert, jnp.ones(100, bool)))
    assert (words == words2).mean() > 0.6


def test_bow_similarity_discriminates(rng):
    # real descriptors cluster around visual words; model that with
    # prototype descriptors ("landmarks") + per-view bit noise
    protos = random_desc(rng, 240)
    train = np.concatenate([perturb_desc(rng, protos, 12) for _ in range(12)])
    voc = voc_mod.build_vocabulary(train, k=8, levels=2)

    place_a, place_b = protos[:120], protos[120:]
    base = perturb_desc(rng, place_a, 12)       # place A, view 1
    similar = perturb_desc(rng, place_a, 12)    # place A, view 2
    different = perturb_desc(rng, place_b, 12)  # place B
    ones = jnp.ones(120, bool)
    vb = bow.bow_vector(voc, jnp.asarray(base), ones)
    vs = bow.bow_vector(voc, jnp.asarray(similar), ones)
    vd = bow.bow_vector(voc, jnp.asarray(different), ones)
    s_sim = float(bow.score(vb, vs))
    s_diff = float(bow.score(vb, vd))
    assert s_sim > s_diff + 0.1, (s_sim, s_diff)


def test_epnp_ransac(rng):
    cam = cam_mod.Camera.from_config(CAM)
    n = 80
    pts = np.stack([rng.uniform(-5, 5, n), rng.uniform(-3, 3, n),
                    rng.uniform(4, 20, n)], -1).astype(np.float32)
    xi = np.array([0.1, -0.2, 0.05, 0.3, 0.1, -0.2], np.float32)
    T_true = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    pc = pts @ T_true[:3, :3].T + T_true[:3, 3]
    uv = np.stack([450 * pc[:, 0] / pc[:, 2] + 320,
                   450 * pc[:, 1] / pc[:, 2] + 240], -1).astype(np.float32)
    uv += rng.normal(0, 0.5, uv.shape)
    out_idx = rng.choice(n, 20, replace=False)
    uv[out_idx] += rng.uniform(20, 80, (20, 2))

    res = pnp.pnp_ransac(
        cam, jnp.asarray(pts), jnp.asarray(uv, jnp.float32),
        jnp.ones(n, jnp.float32), jnp.ones(n, bool),
        jax.random.PRNGKey(0), n_hypotheses=128)
    assert bool(res.ok)
    T = np.asarray(res.Tcw)
    dT = T @ np.linalg.inv(T_true)
    # EPnP is an initializer — demand it lands in pose-opt's basin
    assert np.linalg.norm(dT[:3, 3]) < 0.3, dT[:3, 3]
    inl = np.asarray(res.inliers)
    assert inl[out_idx].mean() < 0.2
    assert inl.mean() > 0.5


def test_epnp_ransac_near_planar(rng):
    """Near-planar geometry (PnPsolver.cc:668-759: the beta N=2/3 cases):
    points on a wall-like plane with millimetric thickness.  The N=1-only
    solve is unstable here; the full beta-case + Gauss-Newton EPnP must
    still land in pose-opt's convergence basin."""
    cam = cam_mod.Camera.from_config(CAM)
    n = 80
    # plane z = 10 + 0.02*x - 0.01*y with 1 mm noise: rank-deficient depth
    x = rng.uniform(-5, 5, n)
    y = rng.uniform(-3, 3, n)
    z = 10.0 + 0.02 * x - 0.01 * y + rng.normal(0, 0.001, n)
    pts = np.stack([x, y, z], -1).astype(np.float32)
    xi = np.array([0.08, -0.15, 0.1, 0.2, -0.1, 0.15], np.float32)
    T_true = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    pc = pts @ T_true[:3, :3].T + T_true[:3, 3]
    uv = np.stack([450 * pc[:, 0] / pc[:, 2] + 320,
                   450 * pc[:, 1] / pc[:, 2] + 240], -1).astype(np.float32)
    uv += rng.normal(0, 0.3, uv.shape)

    res = pnp.pnp_ransac(
        cam, jnp.asarray(pts), jnp.asarray(uv, jnp.float32),
        jnp.ones(n, jnp.float32), jnp.ones(n, bool),
        jax.random.PRNGKey(1), n_hypotheses=128)
    assert bool(res.ok)
    T = np.asarray(res.Tcw)
    dT = T @ np.linalg.inv(T_true)
    assert np.linalg.norm(dT[:3, 3]) < 0.3, dT[:3, 3]
    assert np.asarray(res.inliers).mean() > 0.6


def test_sim3_ransac(rng):
    cam = cam_mod.Camera.from_config(CAM)
    n = 60
    pts1 = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                     rng.uniform(5, 15, n)], -1).astype(np.float32)
    s_true = 1.3
    R_true = np.asarray(lie.so3_exp(jnp.asarray([0.05, 0.3, -0.1])))
    t_true = np.array([0.4, -0.2, 0.6], np.float32)
    # pts1 = s·R·pts2 + t  ⇒  pts2 = R⁻¹(pts1 − t)/s
    pts2 = ((pts1 - t_true) @ R_true) / s_true
    pts2 += rng.normal(0, 0.005, pts2.shape)
    out_idx = rng.choice(n, 12, replace=False)
    pts2[out_idx] += rng.uniform(0.5, 2.0, (12, 3))

    res = sim3solver.sim3_ransac(
        cam, jnp.asarray(pts1), jnp.asarray(pts2, jnp.float32),
        jnp.ones(n, bool), jax.random.PRNGKey(1), fix_scale=False,
        min_inliers=20)
    assert bool(res.ok)
    assert abs(float(res.s12) - s_true) < 0.03, res.s12
    np.testing.assert_allclose(np.asarray(res.R12), R_true, atol=0.02)
    np.testing.assert_allclose(np.asarray(res.t12), t_true, atol=0.1)
    inl = np.asarray(res.inliers)
    assert inl[out_idx].mean() < 0.2


def test_sim3_fix_scale(rng):
    cam = cam_mod.Camera.from_config(CAM)
    n = 40
    pts1 = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                     rng.uniform(5, 15, n)], -1).astype(np.float32)
    R_true = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.2, 0.0])))
    t_true = np.array([0.3, 0.0, 0.1], np.float32)
    pts2 = (pts1 - t_true) @ R_true
    res = sim3solver.sim3_ransac(
        cam, jnp.asarray(pts1), jnp.asarray(pts2, jnp.float32),
        jnp.ones(n, bool), jax.random.PRNGKey(2), fix_scale=True,
        min_inliers=20)
    assert bool(res.ok)
    assert float(res.s12) == 1.0


def test_horn_alignment_batched(rng):
    src = rng.normal(size=(5, 20, 3)).astype(np.float32)
    s_true = rng.uniform(0.5, 2.0, 5).astype(np.float32)
    outs = []
    for i in range(5):
        R = np.asarray(lie.so3_exp(jnp.asarray(
            rng.normal(size=3) * 0.5, jnp.float32)))
        t = rng.normal(size=3).astype(np.float32)
        outs.append((R, t, s_true[i] * src[i] @ R.T + t))
    dst = np.stack([o[2] for o in outs])
    s, R, t = horn.align(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(s), s_true, atol=1e-4)
    for i in range(5):
        np.testing.assert_allclose(np.asarray(R)[i], outs[i][0], atol=1e-4)
