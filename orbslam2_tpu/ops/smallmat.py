"""Exact small-matrix products on the VPU.

f32 matmuls on the TPU MXU are algorithmic bf16 passes: DEFAULT is one
pass (drops ~16 mantissa bits — enough to diverge trajectories, see
orbslam2_tpu/__init__.py), HIGHEST is six passes (exact, but 6x the op
cost).  The geometry and normal-equation products in the optimizers
contract over tiny axes (2/3/4/6), so the MXU brings no throughput —
only the pass multiplier: measured on the bench chip, the local-BA
program costs 79 ms/keyframe at HIGHEST vs 31 ms at DEFAULT with
identical shapes (probe_mapping_stages.py).

Spelling these contractions as broadcast-multiply-reduce keeps them on
the VPU: exact f32 arithmetic AND independent of the matmul-precision
flag.  Use these helpers for every product whose contraction axis is
O(10); leave genuinely large matmuls (Hamming banks, one-hot sampling,
the reduced-camera Cholesky) to the MXU.

Role reference: g2o evaluates the same per-edge Jacobian/Hessian blocks
in scalar C++ doubles (Thirdparty/g2o types_six_dof_expmap.h:59-174);
exact f32 VPU lanes are the TPU-shaped equivalent.
"""

from __future__ import annotations

import jax.numpy as jnp


def bmm(a, b):
    """[..., i, k] x [..., k, j] -> [..., i, j], exact f32 on the VPU."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def matvec(m, v):
    """[..., i, k] x [..., k] -> [..., i]."""
    return jnp.sum(m * v[..., None, :], axis=-1)


def vecmat(v, m):
    """[..., k] x [..., k, j] -> [..., j]  (= mᵀ v batched)."""
    return jnp.sum(v[..., :, None] * m, axis=-2)


def outer_acc(a, b):
    """[..., r, i] x [..., r, j] -> [..., i, j], summed over r.

    The JᵀW J block build: a = weighted Jacobian rows, b = Jacobian rows.
    """
    return jnp.sum(a[..., :, :, None] * b[..., :, None, :], axis=-3)


def tmatvec(a, e):
    """[..., r, i] x [..., r] -> [..., i]  (= aᵀ e batched): Jᵀe."""
    return jnp.sum(a * e[..., None], axis=-2)
