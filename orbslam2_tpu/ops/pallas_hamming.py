"""Pallas TPU kernel: fused 256-bit Hamming distance + top-2 reduction.

``ORBmatcher::DescriptorDistance`` (src/ORBmatcher.cc:1643) is the
system's hottest scalar kernel; the XLA path (ops/hamming.py) computes
the full [A, B] distance matrix in HBM and reduces it in a second pass.
This kernel keeps each [TILE_A, B] distance tile in VMEM, fusing
XOR → popcount → word-sum → validity mask → (min, argmin, 2nd-min) into
one pass per tile — the matrix never touches HBM (SURVEY.md §2.4 P4:
fbow's SIMD Lx classes → VPU popcount, the "Pallas variant" PARITY.md
tracked).

Used by matching.match_descriptors on TPU backends; the XLA path remains
the reference implementation (CPU tests) and the two are asserted equal
on-chip by tests/test_tpu_smoke.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_DIST = 256
_TILE_A = 256


def _kernel(a_ref, av_ref, b_ref, bv_ref, best_ref, idx_ref, sec_ref):
    a = a_ref[:]                                   # [T, 8] uint32
    b = b_ref[:]                                   # [B, 8] uint32
    T = a.shape[0]
    B = b.shape[0]
    acc = jnp.zeros((T, B), jnp.int32)
    for k in range(8):                             # static word loop
        x = a[:, k][:, None] ^ b[:, k][None, :]
        acc = acc + jax.lax.population_count(x).astype(jnp.int32)
    mask = (av_ref[:] > 0) & (bv_ref[:][:, 0][None, :] > 0)  # [T,1]&[1,B]
    d = jnp.where(mask, acc, MAX_DIST)
    best = jnp.min(d, axis=1, keepdims=True)
    # argmin via a masked index-min (Mosaic's argmin lowering is f32-only;
    # this also pins the first-index tie-break best_and_second relies on)
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, B), 1)
    bi = jnp.min(jnp.where(d == best, cols, B), axis=1, keepdims=True)
    d2 = jnp.where(cols == bi, MAX_DIST, d)
    best_ref[:] = best
    idx_ref[:] = bi
    sec_ref[:] = jnp.min(d2, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=())
def hamming_top2(a_desc: jax.Array, a_valid: jax.Array,
                 b_desc: jax.Array, b_valid: jax.Array
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """[A, 8]×[B, 8] uint32 → (best [A], best_idx [A], second [A]).

    Semantics match ``best_and_second(masked_hamming_matrix(...))``:
    invalid rows/cols read MAX_DIST; the second-best excludes the best
    COLUMN.  A is padded to the tile size internally."""
    A = a_desc.shape[0]
    B = b_desc.shape[0]
    T = min(_TILE_A, A) if A % min(_TILE_A, A) == 0 else _TILE_A
    A_pad = ((A + T - 1) // T) * T
    if A_pad != A:
        pad = A_pad - A
        a_desc = jnp.pad(a_desc, ((0, pad), (0, 0)))
        a_valid = jnp.pad(a_valid, (0, pad))
    av = a_valid.astype(jnp.int32)[:, None]        # 2-D: TPU-friendly
    bv = b_valid.astype(jnp.int32)[:, None]

    grid = (A_pad // T,)
    best, idx, sec = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((A_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((A_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((A_pad, 1), jnp.int32),
        ],
    )(a_desc, av, b_desc, bv)
    return best[:A, 0], idx[:A, 0], sec[:A, 0]
