"""Monocular map bootstrap: parallel H/F RANSAC + model selection +
reconstruction.

Replaces ``Initializer`` (src/Initializer.cc): 200×8-point RANSAC sets
(:77-96), homography by normalized DLT (:225) and fundamental by the
8-point algorithm (:267) — the reference fits H and F in two *threads*
(:103-108); here both models for all 200 sets solve in ONE batched SVD
each.  Model selection RH = SH/(SH+SF) > 0.40 (:110-117), reconstruction
by E-decomposition cheirality voting (:469, :908) or the Faugeras
8-motion homography decomposition (:571), both vmapped over hypotheses.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from orbslam2_tpu.ops.triangulate import triangulate_dlt
from orbslam2_tpu.utils import camera as cam_mod
from orbslam2_tpu.utils import lie

N_SETS = 200          # mMaxIterations (Initializer.cc:84)
TH_H = 5.991          # symmetric-transfer chi² gate (CheckHomography)
TH_F = 3.841          # epipolar chi² gate (CheckFundamental)
TH_SCORE = 5.991


class MonoInit(NamedTuple):
    ok: jax.Array         # bool
    Tcw2: jax.Array       # [4, 4] second-frame pose (first = identity)
    points: jax.Array     # [N, 3] triangulated points (per match row)
    good: jax.Array       # [N] triangulation validity
    used_h: jax.Array     # bool — which model reconstructed


def _normalize(pts: jax.Array, valid: jax.Array):
    """Initializer::Normalize (:748): zero-mean, unit mean-abs-dev."""
    w = valid.astype(pts.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(pts * w[:, None], axis=0) / n
    dev = jnp.sum(jnp.abs(pts - mean) * w[:, None], axis=0) / n
    s = 1.0 / jnp.maximum(dev, 1e-9)
    T = jnp.array([[s[0], 0.0, -mean[0] * s[0]],
                   [0.0, s[1], -mean[1] * s[1]],
                   [0.0, 0.0, 1.0]], pts.dtype)
    return (pts - mean) * s, T


def _homog(p):
    return jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)


def _solve_h(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """[S, 8, 2] × 2 → [S, 3, 3] homographies via DLT (ComputeH21, :225)."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], -1)
    r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], -1)
    A = jnp.concatenate([r1, r2], axis=-2)           # [S, 16, 9]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    return Vt[..., -1, :].reshape(A.shape[0], 3, 3)


def _solve_f(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """8-point fundamental with rank-2 projection (ComputeF21, :267)."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    o = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, o],
                  -1)                                 # [S, 8, 9]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    F = Vt[..., -1, :].reshape(A.shape[0], 3, 3)
    U, D, Vt2 = jnp.linalg.svd(F)
    D = D.at[..., 2].set(0.0)
    return U @ (D[..., :, None] * Vt2)


def _refit_h(p1, p2, w):
    """Weighted DLT over all inliers via the 9×9 normal matrix."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], -1)
    r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], -1)
    wf = w.astype(p1.dtype)
    AtA = (jnp.einsum("ni,nj,n->ij", r1, r1, wf)
           + jnp.einsum("ni,nj,n->ij", r2, r2, wf))
    _, V = jnp.linalg.eigh(AtA)
    return V[:, 0].reshape(3, 3)


def _refit_f(p1, p2, w):
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    o = jnp.ones_like(x1)
    a = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, o],
                  -1)
    AtA = jnp.einsum("ni,nj,n->ij", a, a, w.astype(p1.dtype))
    _, V = jnp.linalg.eigh(AtA)
    F = V[:, 0].reshape(3, 3)
    U, D, Vt = jnp.linalg.svd(F)
    return U @ (D.at[2].set(0.0)[:, None] * Vt)


def _score_h(H21, p1, p2, valid):
    """Symmetric transfer score (CheckHomography, :304)."""
    H12 = jnp.linalg.inv(H21)
    q2 = _homog(p1) @ jnp.swapaxes(H21, -1, -2)
    q2 = q2[..., :2] / jnp.where(jnp.abs(q2[..., 2:]) < 1e-12, 1e-12,
                                 q2[..., 2:])
    q1 = _homog(p2) @ jnp.swapaxes(H12, -1, -2)
    q1 = q1[..., :2] / jnp.where(jnp.abs(q1[..., 2:]) < 1e-12, 1e-12,
                                 q1[..., 2:])
    c2 = jnp.sum((q2 - p2) ** 2, -1)
    c1 = jnp.sum((q1 - p1) ** 2, -1)
    sc = (jnp.where(c2 < TH_H, TH_SCORE - c2, 0.0)
          + jnp.where(c1 < TH_H, TH_SCORE - c1, 0.0))
    inl = (c1 < TH_H) & (c2 < TH_H) & valid
    return jnp.sum(sc * valid, -1), inl


def _score_f(F21, p1, p2, valid):
    """Epipolar-distance score (CheckFundamental, :389)."""
    l2 = _homog(p1) @ jnp.swapaxes(F21, -1, -2)       # lines in image 2
    num2 = jnp.sum(l2 * _homog(p2), -1)
    d2 = num2 ** 2 / jnp.maximum(l2[..., 0] ** 2 + l2[..., 1] ** 2, 1e-12)
    l1 = _homog(p2) @ F21
    num1 = jnp.sum(l1 * _homog(p1), -1)
    d1 = num1 ** 2 / jnp.maximum(l1[..., 0] ** 2 + l1[..., 1] ** 2, 1e-12)
    sc = (jnp.where(d2 < TH_F, TH_SCORE - d2, 0.0)
          + jnp.where(d1 < TH_F, TH_SCORE - d1, 0.0))
    inl = (d1 < TH_F) & (d2 < TH_F) & valid
    return jnp.sum(sc * valid, -1), inl


def _check_rt(K, R, t, p1, p2, valid, sigma2_th=16.0):
    """Cheirality/parallax/reproj vote for one (R, t) (CheckRT, :797).
    Returns (n_good, good_mask [N], parallax_deg, points [N, 3])."""
    P1 = K @ jnp.eye(4)[:3, :]
    T2 = lie.rt_to_mat(R, t)
    P2 = K @ T2[:3, :]
    X = triangulate_dlt(P1, P2, p1, p2)
    finite = jnp.all(jnp.isfinite(X), -1)
    z1 = X[:, 2]
    pc2 = X @ R.T + t
    z2 = pc2[:, 2]
    # parallax between the two rays
    C2 = -R.T @ t
    r1 = X
    r2 = X - C2
    cosp = jnp.sum(r1 * r2, -1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-9)
    # reprojection error
    q1 = (X @ K.T)
    q1 = q1[:, :2] / jnp.where(jnp.abs(q1[:, 2:]) < 1e-12, 1e-12, q1[:, 2:])
    q2 = (pc2 @ K.T)
    q2 = q2[:, :2] / jnp.where(jnp.abs(q2[:, 2:]) < 1e-12, 1e-12, q2[:, 2:])
    e1 = jnp.sum((q1 - p1) ** 2, -1)
    e2 = jnp.sum((q2 - p2) ** 2, -1)
    good = (valid & finite & (z1 > 0) & (z2 > 0) & (cosp < 0.99998)
            & (e1 < sigma2_th) & (e2 < sigma2_th))
    # parallax statistic: ~50th-best parallax like the reference's sorted
    # median-ish pick (:857-866) — use the 75th percentile of good cosines
    cos_good = jnp.where(good, cosp, 1.0)
    cos_sorted = jnp.sort(cos_good)
    idx = jnp.minimum(50, jnp.maximum(jnp.sum(good) - 1, 0))
    par = jnp.degrees(jnp.arccos(jnp.clip(cos_sorted[idx], -1.0, 1.0)))
    return jnp.sum(good), good, par, X


def _decompose_e(E):
    """DecomposeE (:908): 4 (R, t) candidates."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                  E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    R1 = jnp.where(jnp.linalg.det(R1) < 0, -R1, R1)
    R2 = jnp.where(jnp.linalg.det(R2) < 0, -R2, R2)
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    return (jnp.stack([R1, R1, R2, R2]),
            jnp.stack([t, -t, t, -t]))


def _decompose_h(H, K):
    """Faugeras SVD homography decomposition (ReconstructH, :571):
    8 motion hypotheses."""
    A = jnp.linalg.inv(K) @ H @ K
    U, D, Vt = jnp.linalg.svd(A)
    V = jnp.swapaxes(Vt, -1, -2)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = D[0], D[1], D[2]
    d2sq = d2 * d2
    aux1 = jnp.sqrt(jnp.clip((d1 * d1 - d2sq) / jnp.maximum(
        d1 * d1 - d3 * d3, 1e-12), 0.0, None))
    aux3 = jnp.sqrt(jnp.clip((d2sq - d3 * d3) / jnp.maximum(
        d1 * d1 - d3 * d3, 1e-12), 0.0, None))
    x1s = jnp.array([1.0, 1.0, -1.0, -1.0]) * aux1
    x3s = jnp.array([1.0, -1.0, 1.0, -1.0]) * aux3

    Rs, ts = [], []
    # case d' = +d2 (:619-652)
    sin_t = jnp.sqrt(jnp.clip((d1 * d1 - d2sq) * (d2sq - d3 * d3),
                              0.0, None)) / jnp.maximum((d1 + d3) * d2, 1e-12)
    cos_t = (d2sq + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    for i in range(4):
        eps = jnp.sign(x1s[i] * x3s[i] + 1e-30)
        st = eps * sin_t
        Rp = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                        [0.0, 0.0, 1.0]])
        Rp = Rp.at[0, 0].set(cos_t).at[0, 2].set(-st)
        Rp = Rp.at[2, 0].set(st).at[2, 2].set(cos_t)
        tp = jnp.array([x1s[i], 0.0, -x3s[i]]) * (d1 - d3)
        Rs.append(s * U @ Rp @ Vt)
        ts.append(U @ tp)
    # case d' = −d2 (:655-688)
    sin_p = jnp.sqrt(jnp.clip((d1 * d1 - d2sq) * (d2sq - d3 * d3),
                              0.0, None)) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cos_p = (d1 * d3 - d2sq) / jnp.maximum((d1 - d3) * d2, 1e-12)
    for i in range(4):
        eps = jnp.sign(x1s[i] * x3s[i] + 1e-30)
        sp = eps * sin_p
        Rp = jnp.array([[1.0, 0.0, 0.0], [0.0, -1.0, 0.0],
                        [0.0, 0.0, -1.0]])
        Rp = Rp.at[0, 0].set(cos_p).at[0, 2].set(sp)
        Rp = Rp.at[2, 0].set(sp).at[2, 2].set(-cos_p)
        tp = jnp.array([x1s[i], 0.0, x3s[i]]) * (d1 + d3)
        Rs.append(s * U @ Rp @ Vt)
        ts.append(U @ tp)
    R = jnp.stack(Rs)
    t = jnp.stack(ts)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    return R, t


def initialize_mono(
    cam: cam_mod.Camera,
    p1: jax.Array,         # [N, 2] matched kps in frame 1 (undistorted)
    p2: jax.Array,         # [N, 2] matched kps in frame 2
    valid: jax.Array,      # [N]
    key: jax.Array,
    min_triangulated: int = 50,
) -> MonoInit:
    """Full Initializer::Initialize (:77-121) as one jittable function."""
    N = p1.shape[0]
    n1, T1 = _normalize(p1, valid)
    n2, T2 = _normalize(p2, valid)
    T2inv = jnp.linalg.inv(T2)

    prob = valid.astype(jnp.float32)
    prob = prob / jnp.clip(jnp.sum(prob), 1.0, None)
    idx = jax.random.choice(key, N, shape=(N_SETS, 8), replace=True, p=prob)

    Hn = _solve_h(n1[idx], n2[idx])
    H21 = jax.vmap(lambda h: T2inv @ h @ T1)(Hn)
    sh, ih = jax.vmap(lambda h: _score_h(h, p1, p2, valid))(H21)
    best_h = jnp.argmax(sh)
    # refit on the winning inlier set (goes beyond the reference's
    # best-minimal-set model: one 9×9 eigensolve buys ~3× less rotation
    # noise before BA)
    H_best = T2inv @ _refit_h(n1, n2, ih[best_h]) @ T1
    SH, _ = _score_h(H_best, p1, p2, valid)

    Fn = _solve_f(n1[idx], n2[idx])
    F21 = jax.vmap(lambda f: T2.T @ f @ T1)(Fn)
    sf, if_ = jax.vmap(lambda f: _score_f(f, p1, p2, valid))(F21)
    best_f = jnp.argmax(sf)
    F_best = T2.T @ _refit_f(n1, n2, if_[best_f]) @ T1
    SF, _ = _score_f(F_best, p1, p2, valid)

    use_h = SH / jnp.maximum(SH + SF, 1e-9) > 0.40   # (:110-117)

    K = cam.K
    # F path: E = KᵀFK → 4 hypotheses; H path: 8 hypotheses — evaluate all
    # 12 with the same cheirality vote and let selection masks decide
    E = K.T @ F_best @ K
    Rf, tf = _decompose_e(E)
    Rh, th = _decompose_h(H_best, K)
    R_all = jnp.concatenate([Rf, Rh])                # [12, 3, 3]
    t_all = jnp.concatenate([tf, th])
    is_h = jnp.arange(12) >= 4

    n_good, good, par, X = jax.vmap(
        lambda R, t: _check_rt(K, R, t, p1, p2, valid))(R_all, t_all)
    model_mask = jnp.where(use_h, is_h, ~is_h)
    n_eff = jnp.where(model_mask, n_good, -1)
    best = jnp.argmax(n_eff)
    n_best = n_eff[best]
    # runner-up must be clearly worse (ReconstructF:529: second<0.75·best)
    n_sorted = jnp.sort(n_eff)
    n_second = n_sorted[-2]
    n_valid = jnp.sum(valid)
    ok = ((n_best > min_triangulated)
          & (n_best.astype(jnp.float32) >= 0.5 * n_valid.astype(jnp.float32))
          & (n_second.astype(jnp.float32) < 0.75 * n_best.astype(jnp.float32))
          & (par[best] > 1.0))
    return MonoInit(ok=ok, Tcw2=lie.rt_to_mat(R_all[best], t_all[best]),
                    points=X[best], good=good[best], used_h=use_h)
