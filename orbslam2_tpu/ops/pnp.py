"""EPnP + RANSAC for relocalization, batched over hypotheses.

Replaces ``PnPsolver`` (src/PnPsolver.cc): Lepetit's EPnP — 4 control
points by PCA (:376), barycentric coordinates (:412), the 12×12 MᵀM
null-space (:437), the β cases N=1/2/3 solved from the 6-pair distance
system (:668-759), a 5-iteration Gauss-Newton refinement of the β vector
(:841), and R|t recovery by 3D-3D alignment (:570) — with all RANSAC
hypotheses solved in one batch instead of ``iterate``'s loop, 4-point
minimal sets (reference parity, :122 mRansacMinSet), and the winner
re-solved on its full inlier set (``Refine``, :261) before return.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from orbslam2_tpu.ops import horn
from orbslam2_tpu.utils import camera as cam_mod
from orbslam2_tpu.utils import lie

MIN_SET = 4       # reference minimal set (PnPsolver.cc:122)
_PAIRS = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))


def _solve_psd(A, b, eps=1e-9):
    return jnp.linalg.solve(A + eps * jnp.eye(A.shape[-1], dtype=A.dtype), b)


def _epnp_solve(Xw: jax.Array, xy_norm: jax.Array,
                w: jax.Array = None) -> jax.Array:
    """One (optionally weighted) EPnP solve.  Xw [S, 3] world points,
    xy_norm [S, 2] normalized image coords, w [S] observation weights
    (None ⇒ uniform; zero-weight rows are ignored — this is what lets the
    RANSAC ``Refine`` re-solve run at static shape over a masked inlier
    set).  Returns Tcw [4, 4]."""
    S = Xw.shape[0]
    if w is None:
        w = jnp.ones((S,), Xw.dtype)
    wsum = jnp.clip(jnp.sum(w), 1e-9, None)
    wn = w / wsum

    # control points: weighted centroid + principal axes (:376-410)
    mu = jnp.sum(Xw * wn[:, None], axis=0)
    Xc = Xw - mu
    cov = jnp.einsum("si,sj,s->ij", Xc, Xc, wn)
    ev, V = jnp.linalg.eigh(cov)                   # ascending eigenvalues
    scale = jnp.sqrt(jnp.clip(ev, 1e-9, None))
    ctrl = jnp.concatenate([mu[None], mu[None] + V.T * scale[:, None]],
                           axis=0)                 # [4, 3]

    # barycentric coords: X = A·ctrl  (:412-435)
    CT = jnp.concatenate([ctrl.T, jnp.ones((1, 4), Xw.dtype)])  # [4,4]
    Xh = jnp.concatenate([Xw.T, jnp.ones((1, S), Xw.dtype)])    # [4,S]
    alpha = jnp.linalg.solve(CT, Xh).T             # [S, 4]

    # M matrix (:437-476), rows scaled by √w so MᵀM is the weighted form
    u, v = xy_norm[:, 0], xy_norm[:, 1]
    zeros = jnp.zeros_like(alpha)
    row_u = jnp.stack([alpha, zeros, -alpha * u[:, None]], axis=-1)
    row_v = jnp.stack([zeros, alpha, -alpha * v[:, None]], axis=-1)
    sw = jnp.sqrt(w)[:, None]
    Mm = jnp.concatenate([row_u.reshape(S, 12) * sw,
                          row_v.reshape(S, 12) * sw])
    MtM = Mm.T @ Mm
    ww, VV = jnp.linalg.eigh(MtM)
    vk = VV[:, :4].T.reshape(4, 4, 3)              # 4 null-space candidates

    # pairwise geometry for the β system (:668-759): for x = Σ_k β_k v_k,
    # ‖Δc_p‖² = Σ_kl β_k β_l G[p,k,l] must equal the world distances ρ_p
    pi = jnp.asarray([p[0] for p in _PAIRS])
    pj = jnp.asarray([p[1] for p in _PAIRS])
    dv = vk[:, pi, :] - vk[:, pj, :]               # [4, 6, 3]
    dw_pairs = ctrl[pi] - ctrl[pj]                 # [6, 3]
    rho = jnp.sum(dw_pairs * dw_pairs, axis=-1)    # [6]
    G = jnp.einsum("kpi,lpi->pkl", dv, dv)         # [6, 4, 4]

    # --- case inits (find_betas_approx_{1,2,3}) ---
    g00 = G[:, 0, 0]
    g01 = G[:, 0, 1]
    g11 = G[:, 1, 1]
    g02 = G[:, 0, 2]
    g12 = G[:, 1, 2]
    # N=1: β₁² from the ratio of summed squared distances
    b1 = jnp.sqrt(jnp.clip(jnp.sum(rho) / jnp.clip(jnp.sum(g00), 1e-12,
                                                   None), 0.0, None))
    init1 = jnp.array([1.0, 0.0, 0.0, 0.0]) * b1
    # N=2: lstsq for (β₁², β₁β₂, β₂²)
    A2 = jnp.stack([g00, 2.0 * g01, g11], axis=-1)           # [6, 3]
    x2 = _solve_psd(A2.T @ A2, A2.T @ rho)
    b2a = jnp.sqrt(jnp.abs(x2[0]))
    b2b = jnp.sqrt(jnp.abs(x2[2])) * jnp.sign(x2[1]) * jnp.sign(x2[0])
    init2 = jnp.array([0.0, 0.0, 0.0, 0.0]).at[0].set(b2a).at[1].set(b2b)
    # N=3: lstsq for (β₁², β₁β₂, β₂², β₁β₃, β₂β₃)
    A3 = jnp.stack([g00, 2.0 * g01, g11, 2.0 * g02, 2.0 * g12], axis=-1)
    x3 = _solve_psd(A3.T @ A3, A3.T @ rho)
    b3a = jnp.sqrt(jnp.abs(x3[0]))
    b3b = jnp.sqrt(jnp.abs(x3[2])) * jnp.sign(x3[1]) * jnp.sign(x3[0])
    b3c = x3[3] / jnp.where(jnp.abs(b3a) < 1e-12, 1e-12, b3a)
    init3 = jnp.array([0.0, 0.0, 0.0, 0.0]
                      ).at[0].set(b3a).at[1].set(b3b).at[2].set(b3c)

    # --- Gauss-Newton on the full β vector (gauss_newton, :841) ---
    def gn(b0):
        def step(b, _):
            e = jnp.einsum("pkl,k,l->p", G, b, b) - rho      # [6]
            J = 2.0 * jnp.einsum("pkl,l->pk", G, b)          # [6, 4]
            db = _solve_psd(J.T @ J, J.T @ e)
            return b - db, None
        b, _ = jax.lax.scan(step, b0, None, length=5)
        return b

    betas = jnp.stack([gn(init1), gn(init2), gn(init3)])     # [3, 4]

    def pose_of(b):
        ctrl_cam = jnp.einsum("k,kij->ij", b, vk)            # [4, 3]
        Xcam = alpha @ ctrl_cam
        sign = jnp.where(jnp.sum(Xcam[:, 2] * wn) < 0, -1.0, 1.0)
        Xcam = Xcam * sign
        _, R, t = horn.align(Xw[None], Xcam[None], weights=w[None],
                             with_scale=False)
        T = lie.rt_to_mat(R[0], t[0])
        pc = Xw @ R[0].T + t[0]
        z = jnp.where(pc[:, 2] < 1e-6, 1e-6, pc[:, 2])
        proj = pc[:, :2] / z[:, None]
        err = jnp.sum(jnp.sum((proj - xy_norm) ** 2, axis=-1) * wn)
        # behind-camera points disqualify the case (cheirality)
        err = err + 1e3 * jnp.sum((pc[:, 2] <= 0) * wn)
        return T, err

    Ts, errs = jax.vmap(pose_of)(betas)
    best = jnp.argmin(errs)
    return Ts[best]


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
    once from 4-point minimal sets, inliers by per-level chi² reprojection
    gate (:309), winner re-solved on its full inlier set (Refine, :261)
    with the weighted EPnP."""
    N = pts_w.shape[0]
    xy_norm = jnp.stack([(uv[:, 0] - cam.cx) / cam.fx,
                         (uv[:, 1] - cam.cy) / cam.fy], axis=-1)

    # sample minimal sets from valid indices (DUtils::Random → jax.random)
    p = valid.astype(jnp.float32)
    p = p / jnp.clip(jnp.sum(p), 1.0, None)
    idx = jax.random.choice(key, N, shape=(n_hypotheses, MIN_SET),
                            replace=True, p=p)
    Ts = jax.vmap(lambda X, x: _epnp_solve(X, x))(pts_w[idx], xy_norm[idx])

    # score every hypothesis against all points
    def score(T):
        uv_p, z = cam_mod.project_world(cam, T, pts_w)
        err2 = jnp.sum((uv_p - uv) ** 2, axis=-1) / level_sigma2
        return (err2 < chi2_th) & (z > 0) & valid

    inl = jax.vmap(score)(Ts)                               # [H, N]
    counts = jnp.sum(inl.astype(jnp.int32), axis=-1)
    best = jnp.argmax(counts)
    ok0 = counts[best] >= min_inliers

    # Refine (:261): weighted re-solve over the winner's inlier set, keep
    # whichever pose scores more inliers
    w_ref = inl[best].astype(pts_w.dtype)
    T_ref = _epnp_solve(pts_w, xy_norm, w_ref)
    inl_ref = score(T_ref)
    n_ref = jnp.sum(inl_ref.astype(jnp.int32))
    take = n_ref >= counts[best]
    Tcw = jnp.where(take, T_ref, Ts[best])
    inliers = jnp.where(take, inl_ref, inl[best])
    n_fin = jnp.where(take, n_ref, counts[best])
    return PnPResult(Tcw=Tcw, inliers=inliers, n_inliers=n_fin,
                     ok=ok0 | (n_fin >= min_inliers))
