"""Closed-form 3D-3D alignment (Horn 1987 / Kabsch), batched.

The core of ``Sim3Solver::ComputeSim3`` (src/Sim3Solver.cc:227: centroid
subtraction, M = Pr2·Pr1ᵀ, quaternion from the 4×4 N-matrix, scale from
symmetric ratio, translation) — rebuilt with the SVD formulation, batched
over RANSAC hypotheses so all minimal sets solve in one kernel.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def align(src: jax.Array, dst: jax.Array, weights: jax.Array = None,
          with_scale: bool = True) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Solve dst ≈ s·R·src + t.

    src/dst: [..., N, 3]; weights: [..., N] (optional).
    Returns (s [...], R [..., 3, 3], t [..., 3]).
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], src.dtype)
    w = weights / jnp.clip(jnp.sum(weights, axis=-1, keepdims=True), 1e-9)
    mu_s = jnp.sum(src * w[..., None], axis=-2)
    mu_d = jnp.sum(dst * w[..., None], axis=-2)
    xs = src - mu_s[..., None, :]
    xd = dst - mu_d[..., None, :]
    cov = jnp.einsum("...ni,...nj,...n->...ij", xd, xs, w)
    U, D, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U @ Vt)
    S = jnp.ones(cov.shape[:-2] + (3,), cov.dtype).at[..., 2].set(det)
    R = U @ (S[..., :, None] * Vt)
    var_s = jnp.einsum("...ni,...ni,...n->...", xs, xs, w)
    s = jnp.where(
        jnp.asarray(with_scale),
        jnp.sum(D * S, axis=-1) / jnp.clip(var_s, 1e-12, None),
        jnp.ones_like(var_s))
    t = mu_d - s[..., None] * jnp.einsum("...ij,...j->...i", R, mu_s)
    return s, R, t


def apply(s: jax.Array, R: jax.Array, t: jax.Array, pts: jax.Array
          ) -> jax.Array:
    return s[..., None, None] * jnp.einsum("...ij,...nj->...ni", R, pts) \
        + t[..., None, :]
