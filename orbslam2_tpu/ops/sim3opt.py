"""Sim3 guided matching + bidirectional Sim3 refinement for loop closing.

Replaces the two reference pieces the RANSAC estimate alone cannot:

  * ``ORBmatcher::SearchBySim3`` (src/ORBmatcher.cc:1098-1229) — project
    each keyframe's map points through the candidate Sim3 into the OTHER
    keyframe's image, window-match by descriptor with scale prediction,
    and keep only two-way agreements.  Here both directions are dense
    masked Hamming matrices (the grid lookup is a CPU pruning structure).
  * ``Optimizer::OptimizeSim3`` (src/Optimizer.cc:1090-1285) — LM on one
    Sim3 vertex with bidirectional reprojection edges (EdgeSim3ProjectXYZ
    / EdgeInverseSim3ProjectXYZ), Huber √10, 5 iterations, outlier
    removal at chi² > th2 in EITHER direction, re-optimization, inlier
    count returned (acceptance ≥ 20, LoopClosing.cc:359-370).

The Sim3 tangent is parameterized as a left-composed chart
S ← (e^σ, exp(ω), υ) ∘ S with the Jacobian obtained by forward-mode
autodiff of the full residual — no hand-derived 4×7 blocks to get wrong.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from orbslam2_tpu.ops import hamming, matching
from orbslam2_tpu.utils import camera as cam_mod
from orbslam2_tpu.utils import lie

TH2_SIM3 = 10.0   # chi² threshold (Optimizer.cc deltaHuber² = th2 = 10)


def _project(cam, p):
    z = jnp.where(jnp.abs(p[..., 2]) < 1e-9, 1e-9, p[..., 2])
    u = cam.fx * p[..., 0] / z + cam.cx
    v = cam.fy * p[..., 1] / z + cam.cy
    return jnp.stack([u, v], axis=-1)


def search_by_sim3(
    cam: cam_mod.Camera,
    xy1, level1, desc1, valid1, mp1_pos_c1, mp1_ok,
    xy2, level2, desc2, valid2, mp2_pos_c2, mp2_ok,
    min_dist1, max_dist1, min_dist2, max_dist2,
    s12, R12, t12,
    scale_factor: float, n_levels: int,
    th: float = 7.5,
    width: float = 640.0, height: float = 480.0,
) -> Tuple[jax.Array, jax.Array]:
    """Two-way Sim3-guided matching between two keyframes' map points.

    Inputs are per-feature arrays of each keyframe ([N] each): keypoints
    (xy/level/desc/valid) and the 3D position of the feature's map point
    in its OWN camera frame (mp*_pos_c*, masked by mp*_ok).

    Returns (match12 [N1] feature1 → feature2 or −1, n_matches) — only
    two-way agreements survive (ORBmatcher.cc:1217-1226).
    """
    s21, R21, t21 = lie.sim3_inv(s12, R12, t12)

    def one_direction(pos_src_c, src_ok, desc_src, dmin, dmax,
                      s, R, t, xy_t, lvl_t, desc_t, val_t):
        # source map points into the target camera frame
        p_t = s * (pos_src_c @ R.T) + t                      # [N, 3]
        z_ok = p_t[:, 2] > 0
        uv = _project(cam, p_t)
        in_img = ((uv[:, 0] >= 0) & (uv[:, 0] < width)
                  & (uv[:, 1] >= 0) & (uv[:, 1] < height))
        dist = jnp.linalg.norm(p_t, axis=-1)
        band_ok = (dist >= dmin) & (dist <= dmax)
        pred = matching.predict_scale(dist, dmax, scale_factor, n_levels)
        radius = th * jnp.power(scale_factor, pred.astype(jnp.float32))
        du = jnp.abs(uv[:, 0:1] - xy_t[None, :, 0])
        dv = jnp.abs(uv[:, 1:2] - xy_t[None, :, 1])
        in_win = (du < radius[:, None]) & (dv < radius[:, None])
        lvl_ok = ((lvl_t[None, :] >= pred[:, None] - 1)
                  & (lvl_t[None, :] <= pred[:, None]))
        gate = (in_win & lvl_ok & val_t[None, :]
                & (src_ok & z_ok & in_img & band_ok)[:, None])
        d = hamming.hamming_matrix(desc_src, desc_t)
        d = jnp.where(gate, d, hamming.MAX_DIST)
        best = jnp.min(d, axis=1)
        best_idx = jnp.argmin(d, axis=1)
        ok = best <= matching.TH_HIGH
        return jnp.where(ok, best_idx, -1)

    m12 = one_direction(mp1_pos_c1, mp1_ok & valid1, desc1,
                        min_dist1, max_dist1, s21, R21, t21,
                        xy2, level2, desc2, valid2 & mp2_ok)
    m21 = one_direction(mp2_pos_c2, mp2_ok & valid2, desc2,
                        min_dist2, max_dist2, s12, R12, t12,
                        xy1, level1, desc1, valid1 & mp1_ok)
    # two-way agreement
    N1 = m12.shape[0]
    j_safe = jnp.where(m12 >= 0, m12, 0)
    agree = (m12 >= 0) & (m21[j_safe] == jnp.arange(N1, dtype=m12.dtype))
    match12 = jnp.where(agree, m12, -1)
    return match12, jnp.sum(agree.astype(jnp.int32))


class Sim3OptResult(NamedTuple):
    s12: jax.Array
    R12: jax.Array
    t12: jax.Array
    inlier: jax.Array     # [N] bool (both directions pass)
    n_inliers: jax.Array


def optimize_sim3(
    cam: cam_mod.Camera,
    p1c: jax.Array,          # [N, 3] matched points in camera-1 frame
    p2c: jax.Array,          # [N, 3] same points in camera-2 frame
    uv1: jax.Array,          # [N, 2] observed keypoints in image 1
    uv2: jax.Array,          # [N, 2] observed keypoints in image 2
    inv_sigma2_1: jax.Array,  # [N]
    inv_sigma2_2: jax.Array,  # [N]
    valid: jax.Array,        # [N]
    s0, R0, t0,
    fix_scale: bool,
    th2: float = TH2_SIM3,
    iters_a: int = 5,
    iters_b: int = 10,
) -> Sim3OptResult:
    """Bidirectional Sim3 LM refinement (Optimizer::OptimizeSim3)."""
    delta_huber = jnp.sqrt(jnp.float32(th2))

    def residuals(dx, s, R, t):
        ds = jnp.exp(dx[6])
        dR = lie.so3_exp(dx[0:3])
        dt = dx[3:6]
        s_, R_, t_ = lie.sim3_mul(ds, dR, dt, s, R, t)
        si, Ri, ti = lie.sim3_inv(s_, R_, t_)
        pred1 = _project(cam, s_ * (p2c @ R_.T) + t_)       # S12·p2 → im1
        pred2 = _project(cam, si * (p1c @ Ri.T) + ti)       # S21·p1 → im2
        e1 = uv1 - pred1
        e2 = uv2 - pred2
        return jnp.concatenate([e1, e2], axis=-1)            # [N, 4]

    def chi2_of(e):
        c1 = jnp.sum(e[:, 0:2] ** 2, axis=-1) * inv_sigma2_1
        c2 = jnp.sum(e[:, 2:4] ** 2, axis=-1) * inv_sigma2_2
        return c1, c2

    def robust_total(c1, c2, inlier):
        def rho(c):
            sq = jnp.sqrt(jnp.maximum(c, 1e-12))
            return jnp.where(sq > delta_huber,
                             2.0 * delta_huber * sq - th2, c)
        return jnp.sum(jnp.where(inlier, rho(c1) + rho(c2), 0.0))

    def lm(s, R, t, inlier, n_iters):
        def normal_eq(s, R, t):
            zero = jnp.zeros((7,), jnp.float32)
            e = residuals(zero, s, R, t)
            J = jax.jacfwd(residuals)(zero, s, R, t)         # [N, 4, 7]
            c1, c2 = chi2_of(e)
            sq1 = jnp.sqrt(jnp.maximum(c1, 1e-12))
            sq2 = jnp.sqrt(jnp.maximum(c2, 1e-12))
            w1 = inv_sigma2_1 * jnp.where(sq1 > delta_huber,
                                          delta_huber / sq1, 1.0)
            w2 = inv_sigma2_2 * jnp.where(sq2 > delta_huber,
                                          delta_huber / sq2, 1.0)
            m = inlier.astype(jnp.float32)
            w = jnp.stack([w1 * m, w1 * m, w2 * m, w2 * m], axis=-1)
            Jw = J * w[:, :, None]
            H = jnp.einsum("nij,nik->jk", Jw, J)
            b = jnp.einsum("nij,ni->j", Jw, e)
            return H, b, robust_total(c1, c2, inlier)

        def iteration(carry, _):
            s_b, R_b, t_b, H_b, b_b, cost_b, lam = carry
            H_lm = H_b + lam * jnp.eye(7, dtype=H_b.dtype)
            dx = -jnp.linalg.solve(H_lm, b_b)
            if fix_scale:
                dx = dx.at[6].set(0.0)
            ds = jnp.exp(dx[6])
            dR = lie.so3_exp(dx[0:3])
            s_c, R_c, t_c = lie.sim3_mul(ds, dR, dx[3:6], s_b, R_b, t_b)
            H_c, b_c, cost_c = normal_eq(s_c, R_c, t_c)
            acc = cost_c < cost_b
            out = (jnp.where(acc, s_c, s_b),
                   jnp.where(acc, R_c, R_b),
                   jnp.where(acc, t_c, t_b),
                   jnp.where(acc, H_c, H_b),
                   jnp.where(acc, b_c, b_b),
                   jnp.where(acc, cost_c, cost_b),
                   jnp.where(acc, lam * 0.5, lam * 4.0))
            return out, None

        H0, b0, cost0 = normal_eq(s, R, t)
        (s, R, t, _, _, _, _), _ = jax.lax.scan(
            iteration, (s, R, t, H0, b0, cost0, jnp.float32(1e-6)), None,
            length=n_iters)
        return s, R, t

    s, R, t = jnp.float32(s0), R0.astype(jnp.float32), t0.astype(jnp.float32)
    inlier = valid
    s, R, t = lm(s, R, t, inlier, iters_a)
    e = residuals(jnp.zeros((7,), jnp.float32), s, R, t)
    c1, c2 = chi2_of(e)
    inlier = valid & (c1 <= th2) & (c2 <= th2)
    s, R, t = lm(s, R, t, inlier, iters_b)
    e = residuals(jnp.zeros((7,), jnp.float32), s, R, t)
    c1, c2 = chi2_of(e)
    inlier = valid & (c1 <= th2) & (c2 <= th2)
    return Sim3OptResult(s12=s, R12=R, t12=t, inlier=inlier,
                         n_inliers=jnp.sum(inlier.astype(jnp.int32)))
