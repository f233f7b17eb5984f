"""RANSAC Sim(3)/SE(3) between two keyframes' matched 3D points.

Replaces ``Sim3Solver`` (src/Sim3Solver.cc): minimal sets of 3
correspondences solved by closed-form Horn alignment (:227), symmetric
reprojection inlier check (:341), stereo fixes scale = 1 (mbFixScale,
System.cc:105).  All RANSAC hypotheses are solved in one batched kernel
(ops/horn.align) instead of the 5-iterations-per-call ``iterate`` loop
(LoopClosing.cc:337).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam2_tpu.ops import horn
from orbslam2_tpu.utils import camera as cam_mod


class Sim3Result(NamedTuple):
    s12: jax.Array       # scale
    R12: jax.Array       # [3, 3]
    t12: jax.Array       # [3]
    inliers: jax.Array   # [N] bool
    n_inliers: jax.Array
    ok: jax.Array


def sim3_ransac(
    cam: cam_mod.Camera,
    pts1_c: jax.Array,    # [N, 3] matched points in camera-1 frame
    pts2_c: jax.Array,    # [N, 3] same points in camera-2 frame
    valid: jax.Array,     # [N]
    key: jax.Array,
    fix_scale: bool,
    n_hypotheses: int = 128,
    th2_1: float = 9.210,   # chi² 99% 2-dof × sigma² (Sim3Solver.cc:83-86)
    th2_2: float = 9.210,
    min_inliers: int = 20,
) -> Sim3Result:
    """Find S12 with X1 ≈ s·R·X2 + t.  Inliers by symmetric reprojection."""
    N = pts1_c.shape[0]
    p = valid.astype(jnp.float32)
    p = p / jnp.clip(jnp.sum(p), 1.0, None)
    idx = jax.random.choice(key, N, shape=(n_hypotheses, 3), replace=True,
                            p=p)
    s, R, t = horn.align(pts2_c[idx], pts1_c[idx], with_scale=not fix_scale)

    # symmetric reprojection check (CheckInliers, Sim3Solver.cc:341)
    X2_in1 = horn.apply(s, R, t, pts2_c[None].repeat(n_hypotheses, 0))
    s_inv = 1.0 / s
    R_inv = jnp.swapaxes(R, -1, -2)
    t_inv = -s_inv[:, None] * jnp.einsum("hij,hj->hi", R_inv, t)
    X1_in2 = horn.apply(s_inv, R_inv, t_inv,
                        pts1_c[None].repeat(n_hypotheses, 0))
    uv1_pred = cam_mod.project(cam, X2_in1)
    uv2_pred = cam_mod.project(cam, X1_in2)
    uv1 = cam_mod.project(cam, pts1_c)
    uv2 = cam_mod.project(cam, pts2_c)
    e1 = jnp.sum((uv1_pred - uv1[None]) ** 2, axis=-1)
    e2 = jnp.sum((uv2_pred - uv2[None]) ** 2, axis=-1)
    inl = ((e1 < th2_1) & (e2 < th2_2) & (X2_in1[..., 2] > 0)
           & (X1_in2[..., 2] > 0) & valid[None])
    counts = jnp.sum(inl.astype(jnp.int32), axis=-1)
    best = jnp.argmax(counts)

    # refine on the winning inlier set (one weighted re-solve)
    w = inl[best].astype(jnp.float32)
    s_r, R_r, t_r = horn.align(pts2_c[None], pts1_c[None], w[None],
                               with_scale=not fix_scale)
    return Sim3Result(s12=s_r[0], R12=R_r[0], t12=t_r[0],
                      inliers=inl[best], n_inliers=counts[best],
                      ok=counts[best] >= min_inliers)
