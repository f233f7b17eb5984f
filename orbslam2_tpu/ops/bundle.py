"""Bundle adjustment: batched Levenberg-Marquardt with a dense reduced
camera system via Schur complement on landmarks.

Replaces ``Optimizer::LocalBundleAdjustment`` (src/Optimizer.cc:497) and
``Optimizer::BundleAdjustment`` / GBA (src/Optimizer.cc:92), whose g2o
backend does sparse-Schur LM (BlockSolver_6_3 + LinearSolverEigen with
landmark marginalization, ``vPoint->setMarginalized(true)``,
Optimizer.cc:623).

TPU-first formulation — no sparse matrices anywhere:
  * residuals/Jacobians for all O observations evaluated batched (VPU),
  * per-camera 6×6, per-landmark 3×3 and camera-landmark 6×3 blocks built
    by scatter-add segment sums,
  * the cross-camera Schur term  Σ_p U_p·Hpp_p⁻¹·U_pᵀ  is one batched
    [P,6C,3]×[P,3,3]×[P,3,6C] einsum chain on the MXU,
  * the reduced 6C×6C system is Jacobi-preconditioned and solved dense by
    Cholesky — at the local-BA window size (C ≤ 32 ⇒ 192×192) this is
    microseconds on the MXU; for global BA it stays dense (C ≤ 512 ⇒
    3072×3072, still MXU-friendly).

Iteration schedule mirrors the reference: 5 LM iterations, chi² outlier
down-weighting, 10 more, then a final outlier classification
(Optimizer.cc:703-801).  fp32 with Jacobi preconditioning replaces g2o's
fp64 — tests pin convergence to ground truth.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from orbslam2_tpu.ops.pose_opt import CHI2_MONO, CHI2_STEREO
from orbslam2_tpu.utils import camera as cam_mod
from orbslam2_tpu.utils import lie


class BAProblem(NamedTuple):
    """Static-shape BA instance.  Cameras [0, n_free) are optimized; the
    rest are fixed anchors (the reference's ``setFixed`` keyframes that
    observe local points, Optimizer.cc:533-548)."""

    poses: jax.Array       # [C_total, 4, 4] world→camera
    points: jax.Array      # [P, 3]
    point_valid: jax.Array  # [P] bool
    cam_i: jax.Array       # [O] int32 index into poses
    pt_i: jax.Array        # [O] int32 index into points
    uv: jax.Array          # [O, 2]
    ur: jax.Array          # [O] right coord, <0 ⇒ mono edge
    inv_sigma2: jax.Array  # [O]
    valid: jax.Array       # [O] bool


def _residuals_jacobians(cam: cam_mod.Camera, poses: jax.Array,
                         points: jax.Array, prob: BAProblem):
    """e [O,3], J_cam [O,3,6], J_pt [O,3,3], is_stereo [O], behind [O]."""
    T = poses[prob.cam_i]                       # [O, 4, 4]
    R = T[:, :3, :3]
    p = points[prob.pt_i]
    pc = jnp.einsum("oij,oj->oi", R, p) + T[:, :3, 3]
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    z_safe = jnp.where(z < 1e-6, 1e-6, z)
    invz = 1.0 / z_safe
    invz2 = invz * invz

    u = cam.fx * x * invz + cam.cx
    v = cam.fy * y * invz + cam.cy
    ur_pred = u - cam.bf * invz
    is_stereo = prob.ur >= 0
    e = jnp.stack([prob.uv[:, 0] - u,
                   prob.uv[:, 1] - v,
                   jnp.where(is_stereo, prob.ur - ur_pred, 0.0)], axis=-1)

    zero = jnp.zeros_like(x)
    du_dp = jnp.stack([cam.fx * invz, zero, -cam.fx * x * invz2], axis=-1)
    dv_dp = jnp.stack([zero, cam.fy * invz, -cam.fy * y * invz2], axis=-1)
    dur_dp = du_dp + jnp.stack([zero, zero, cam.bf * invz2], axis=-1)
    dproj = jnp.stack([du_dp, dv_dp,
                       jnp.where(is_stereo[:, None], dur_dp, 0.0)], axis=-2)

    # camera: pc = exp(ξ)·(R p + t) ⇒ dpc/dξ = [−[pc]× | I]
    dpc_dxi = jnp.concatenate(
        [-lie.hat(pc),
         jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:-1] + (3, 3))],
        axis=-1)
    J_cam = -(dproj @ dpc_dxi)                  # [O, 3, 6]
    # landmark: dpc/dp = R
    J_pt = -(dproj @ R)                         # [O, 3, 3]
    return e, J_cam, J_pt, is_stereo, z < 1e-6


def _chi2_of(e, is_stereo, inv_sigma2):
    sq = jnp.sum(e * e, axis=-1) * inv_sigma2
    th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    return sq, th


def bundle_adjust(
    cam: cam_mod.Camera,
    prob: BAProblem,
    n_free: int,
    iters_a: int = 5,
    iters_b: int = 10,
    lam0: float = 1e-4,
    fix_first_free: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run the two-stage LM schedule.  Returns (poses, points, obs_inlier).

    ``fix_first_free`` additionally freezes camera 0 (global-BA gauge fix,
    Optimizer.cc:136 ``setFixed(pKF->mnId==0)``).
    """
    C = n_free
    P = prob.points.shape[0]

    cam_slot = jnp.where(prob.cam_i < C, prob.cam_i, C)  # C = dump slot

    def lm_solve(poses, points, obs_w, n_iters, use_huber):
        """n_iters of LM with fixed observation weights obs_w."""
        delta_m = jnp.sqrt(CHI2_MONO)
        delta_s = jnp.sqrt(CHI2_STEREO)

        def total_chi2(poses, points):
            e, _, _, is_s, behind = _residuals_jacobians(cam, poses, points, prob)
            sq, _ = _chi2_of(e, is_s, prob.inv_sigma2)
            if use_huber:
                # robust total cost (Huber rho), so accept/reject compares
                # the same objective LM is minimizing
                d = jnp.where(is_s, delta_s, delta_m)
                r = jnp.sqrt(jnp.maximum(sq, 1e-12))
                rho = jnp.where(r <= d, sq, 2.0 * d * r - d * d)
            else:
                rho = sq
            return jnp.sum(jnp.where(obs_w > 0, rho, 0.0) * obs_w)

        def iteration(carry, _):
            poses, points, lam, last_cost = carry
            e, Jc, Jp, is_s, behind = _residuals_jacobians(cam, poses, points, prob)
            w = obs_w * prob.inv_sigma2 * (~behind).astype(jnp.float32)
            if use_huber:
                sq, _ = _chi2_of(e, is_s, prob.inv_sigma2)
                d = jnp.where(is_s, delta_s, delta_m)
                r = jnp.sqrt(jnp.maximum(sq, 1e-12))
                w = w * jnp.where(r > d, d / r, 1.0)

            Jc_w = Jc * w[:, None, None]
            Jp_w = Jp * w[:, None, None]

            # block builds (scatter segment-sums)
            Hcc = jnp.zeros((C + 1, 6, 6), poses.dtype).at[cam_slot].add(
                jnp.einsum("ori,orj->oij", Jc_w, Jc))[:C]
            Hpp = jnp.zeros((P, 3, 3), poses.dtype).at[prob.pt_i].add(
                jnp.einsum("ori,orj->oij", Jp_w, Jp))
            Ucp = jnp.zeros((P, C + 1, 6, 3), poses.dtype).at[
                prob.pt_i, cam_slot].add(
                jnp.einsum("ori,orj->oij", Jc_w, Jp))[:, :C]
            g_c = jnp.zeros((C + 1, 6), poses.dtype).at[cam_slot].add(
                jnp.einsum("ori,or->oi", Jc_w, e))[:C]
            g_p = jnp.zeros((P, 3), poses.dtype).at[prob.pt_i].add(
                jnp.einsum("ori,or->oi", Jp_w, e))

            # damping (g2o Levenberg: H + λ·diag(H)) + floor for empty blocks
            eye3 = jnp.eye(3, dtype=poses.dtype)
            eye6 = jnp.eye(6, dtype=poses.dtype)
            Hpp_d = Hpp + (lam * _diag3(Hpp) + 1e-6) * eye3
            Hcc_d = Hcc + (lam * _diag6(Hcc) + 1e-6) * eye6
            Hpp_inv = _inv3x3(Hpp_d)

            # Schur: S = Hcc − Σ_p U_p Hpp⁻¹ U_pᵀ ; r = g_c − Σ_p U_p Hpp⁻¹ g_p
            U = Ucp.reshape(P, C * 6, 3)
            UHinv = jnp.einsum("pij,pjk->pik", U, Hpp_inv)      # [P, 6C, 3]
            S = _block_diag_embed(Hcc_d, C) - jnp.einsum(
                "pik,pjk->ij", UHinv, U)
            r = g_c.reshape(C * 6) - jnp.einsum("pik,pk->i", UHinv, g_p)

            if fix_first_free:
                # zero out camera-0 rows/cols, identity on its diagonal
                m = jnp.ones((C * 6,), poses.dtype).at[:6].set(0.0)
                S = S * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
                r = r * m

            # Jacobi preconditioning for fp32 Cholesky
            dscale = 1.0 / jnp.sqrt(jnp.clip(jnp.diagonal(S), 1e-12, None))
            S_pre = S * dscale[:, None] * dscale[None, :]
            rhs = -r * dscale
            L = jnp.linalg.cholesky(
                S_pre + 1e-7 * jnp.eye(C * 6, dtype=poses.dtype))
            dc = jax.scipy.linalg.cho_solve((L, True), rhs) * dscale
            dc_blocks = dc.reshape(C, 6)

            # back-substitute landmarks: δp = Hpp⁻¹(−g_p − Uᵀ δc)
            Ut_dc = jnp.einsum("pcij,ci->pj",
                               Ucp.transpose(0, 1, 2, 3), dc_blocks)
            dp = jnp.einsum("pij,pj->pi", Hpp_inv, -g_p - Ut_dc)

            new_free = jax.vmap(lambda dxi, T: lie.se3_exp(dxi) @ T)(
                dc_blocks, poses[:C])
            poses_new = poses.at[:C].set(new_free)
            points_new = jnp.where(prob.point_valid[:, None],
                                   points + dp, points)

            new_cost = total_chi2(poses_new, points_new)
            accept = new_cost < last_cost
            poses = jnp.where(accept, poses_new, poses)
            points = jnp.where(accept, points_new, points)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            last_cost = jnp.where(accept, new_cost, last_cost)
            return (poses, points, lam, last_cost), None

        cost0 = total_chi2(poses, points)
        (poses, points, _, _), _ = jax.lax.scan(
            iteration, (poses, points, jnp.asarray(lam0, poses.dtype), cost0),
            None, length=n_iters)
        return poses, points

    obs_w = prob.valid.astype(jnp.float32)
    poses, points = lm_solve(prob.poses, prob.points, obs_w, iters_a,
                             use_huber=True)

    # outlier pass (Optimizer.cc:703-711): drop chi²>th or behind-camera
    e, _, _, is_s, behind = _residuals_jacobians(cam, poses, points, prob)
    sq, th = _chi2_of(e, is_s, prob.inv_sigma2)
    inlier = prob.valid & (sq <= th) & (~behind)
    obs_w = inlier.astype(jnp.float32)
    poses, points = lm_solve(poses, points, obs_w, iters_b, use_huber=False)

    e, _, _, is_s, behind = _residuals_jacobians(cam, poses, points, prob)
    sq, th = _chi2_of(e, is_s, prob.inv_sigma2)
    inlier = prob.valid & (sq <= th) & (~behind)
    return poses, points, inlier


# ------------------------------------------------------------- helpers ----

def _diag3(H):
    return jnp.einsum("pii->p", H)[:, None, None] / 3.0


def _diag6(H):
    return jnp.einsum("cii->c", H)[:, None, None] / 6.0


def _inv3x3(A: jax.Array) -> jax.Array:
    """Batched closed-form 3×3 inverse (adjugate) — avoids linalg.inv's
    LU path on tiny matrices."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack([
        jnp.stack([A11, A12, A13], axis=-1),
        jnp.stack([A21, A22, A23], axis=-1),
        jnp.stack([A31, A32, A33], axis=-1),
    ], axis=-2)
    return adj / det[..., None, None]


def _block_diag_embed(blocks: jax.Array, C: int) -> jax.Array:
    """[C, 6, 6] → [6C, 6C] block-diagonal."""
    S = jnp.zeros((C, 6, C, 6), blocks.dtype)
    idx = jnp.arange(C)
    S = S.at[idx, :, idx, :].set(blocks)
    return S.reshape(C * 6, C * 6)
