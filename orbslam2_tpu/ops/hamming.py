"""Batched 256-bit Hamming distance — the system's hottest scalar kernel
made dense.

Replaces ``ORBmatcher::DescriptorDistance`` (src/ORBmatcher.cc:1643, the
bit-twiddling popcount called in every matcher inner loop) and fbow's SIMD
``Lx`` distance classes (Thirdparty/fbow/fbow.h:206+).  Instead of one
distance at a time, we compute whole [N, M] distance matrices:
XOR + population_count + a reduction over the 8 uint32 words, which XLA
fuses into a single VPU pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_DIST = 256  # distances are in [0, 256]; use as +inf sentinel


def hamming_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """[N, 8] uint32 × [M, 8] uint32 → [N, M] int32 Hamming distances."""
    x = jax.lax.population_count(a[:, None, :] ^ b[None, :, :])
    return jnp.sum(x, axis=-1).astype(jnp.int32)


def hamming_pairwise(a: jax.Array, b: jax.Array) -> jax.Array:
    """[..., 8] × [..., 8] → [...] elementwise distances."""
    return jnp.sum(jax.lax.population_count(a ^ b), axis=-1).astype(jnp.int32)


def masked_hamming_matrix(a: jax.Array, a_valid: jax.Array,
                          b: jax.Array, b_valid: jax.Array) -> jax.Array:
    """Hamming matrix with invalid rows/cols forced to MAX_DIST."""
    d = hamming_matrix(a, b)
    mask = a_valid[:, None] & b_valid[None, :]
    return jnp.where(mask, d, MAX_DIST)
