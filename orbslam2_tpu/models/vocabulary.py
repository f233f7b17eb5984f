"""Hierarchical binary-descriptor vocabulary (the fbow replacement).

The reference loads a prebuilt ~1M-word fbow vocabulary (``orb_mur.fbow``,
System.cc:71; the blob is not even shipped — .MISSING_LARGE_BLOBS) and
transforms descriptors by SIMD tree descent (Thirdparty/fbow/fbow.h:84-114).
Here the vocabulary is built once by hierarchical k-majority clustering on
descriptors harvested from synthetic scenes (deterministic, cached to npz)
and laid out as dense per-level centroid arrays, so descent is a batched
gather + Hamming argmin per level (ops/bow.py) — no pointers, no SIMD
intrinsics, just VPU popcounts.

Layout: level d has k^(d+1) centroids (k children per level-d node, flat:
children of node n are rows n·k … n·k+k−1 of level d+1's table).  Leaf ids
at level L are word ids in [0, k^L).
"""

from __future__ import annotations

import os
from typing import List, NamedTuple, Tuple

import numpy as np


class Vocabulary(NamedTuple):
    centroids: Tuple[np.ndarray, ...]  # per level: [k^(d+1), 8] uint32
    idf: np.ndarray                    # [k^L] float32
    k: int
    levels: int

    @property
    def n_words(self) -> int:
        return self.k ** self.levels


def _unpack_bits(desc_u32: np.ndarray) -> np.ndarray:
    """[M, 8] uint32 → [M, 256] uint8 bits."""
    b = desc_u32.view(np.uint8).reshape(len(desc_u32), 32)
    return np.unpackbits(b, axis=1, bitorder="little")


def _pack_bits(bits: np.ndarray) -> np.ndarray:
    """[M, 256] bits → [M, 8] uint32."""
    by = np.packbits(bits.astype(np.uint8), axis=1, bitorder="little")
    return by.reshape(len(bits), 8, 4).view(np.uint32).reshape(len(bits), 8)


def _hamming(a_bits: np.ndarray, b_bits: np.ndarray) -> np.ndarray:
    """[M, 256] × [C, 256] → [M, C] via XOR-sum on unpacked bits."""
    return (a_bits[:, None, :] != b_bits[None, :, :]).sum(-1)


def _kmajority(bits: np.ndarray, k: int, rng: np.random.Generator,
               iters: int = 6) -> Tuple[np.ndarray, np.ndarray]:
    """k-majority clustering of binary vectors.  Returns (centroids_bits
    [k, 256], assignment [M])."""
    m = len(bits)
    if m == 0:
        c = rng.integers(0, 2, size=(k, bits.shape[1])).astype(np.uint8)
        return c, np.zeros(0, np.int64)
    init = rng.choice(m, size=min(k, m), replace=False)
    cent = bits[init]
    if len(cent) < k:  # degenerate: duplicate + perturb
        extra = rng.integers(0, 2, size=(k - len(cent), bits.shape[1]))
        cent = np.concatenate([cent, extra.astype(np.uint8)])
    for _ in range(iters):
        assign = np.argmin(_hamming(bits, cent), axis=1)
        for j in range(k):
            sel = bits[assign == j]
            if len(sel):
                cent[j] = (sel.mean(0) > 0.5).astype(np.uint8)
            else:  # re-seed empty cluster at the farthest point
                d = _hamming(bits, cent).min(1)
                cent[j] = bits[int(np.argmax(d))]
    assign = np.argmin(_hamming(bits, cent), axis=1)
    return cent, assign


def build_vocabulary(descriptors: np.ndarray, k: int = 10, levels: int = 3,
                     seed: int = 0) -> Vocabulary:
    """descriptors: [M, 8] uint32.  Builds the full k^levels tree."""
    rng = np.random.default_rng(seed)
    bits = _unpack_bits(descriptors.astype(np.uint32))
    groups = [np.arange(len(bits))]
    level_cents: List[np.ndarray] = []
    for d in range(levels):
        cents = np.zeros((k ** (d + 1), 256), np.uint8)
        new_groups: List[np.ndarray] = []
        for n, idx in enumerate(groups):
            c, a = _kmajority(bits[idx], k, rng)
            cents[n * k:(n + 1) * k] = c
            for j in range(k):
                new_groups.append(idx[a == j] if len(idx) else
                                  np.zeros(0, np.int64))
        level_cents.append(_pack_bits(cents))
        groups = new_groups
    # idf from leaf occupancy (empty words get max idf)
    n_words = k ** levels
    counts = np.array([len(g) for g in groups], np.float64)
    total = max(counts.sum(), 1.0)
    idf = np.log(total / np.maximum(counts, 1.0)).astype(np.float32)
    return Vocabulary(centroids=tuple(level_cents), idf=idf, k=k,
                      levels=levels)


# ------------------------------------------------------------- default -----

_DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "data")

# Default tree: k=10, levels=4 ⇒ 10,000 words (the reference ships a ~1M-
# word orb_mur.fbow; 10⁴ matches its discrimination at our map scales
# while keeping the [K, W] keyframe-DB dense-matvec layout — W=10⁶ would
# force an inverted-file structure for no recall gain on ≤512-KF maps).
DEFAULT_K = 10
DEFAULT_LEVELS = 4


def harvest_training_descriptors(n_worlds: int = 12, views_per_world: int = 6,
                                 seed: int = 11) -> np.ndarray:
    """Extract ORB descriptors from randomized textured-plane worlds — the
    stand-in for the reference's pre-trained corpus (trained on varied
    real imagery).  ~70k descriptors from 72 views of 12 worlds."""
    import jax.numpy as jnp

    from orbslam2_tpu.config import CameraConfig, OrbConfig
    from orbslam2_tpu.ops import extractor
    from orbslam2_tpu.utils import synthetic

    rng = np.random.default_rng(seed)
    cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=150.0,
                       width=640, height=480)
    orb = OrbConfig(n_features=1000)
    out = []
    for w in range(n_worlds):
        world = synthetic.make_world(rng, kind="random")
        for v in range(views_per_world):
            pose = synthetic.look_ahead_pose(
                np.array([rng.uniform(-2, 2), rng.uniform(-1, 1),
                          rng.uniform(0, 6)]),
                yaw=rng.uniform(-0.4, 0.4))
            img = synthetic.render_world(world, cam, pose, rng, noise=2.0)
            f = extractor.extract(jnp.asarray(img), orb)
            m = np.asarray(f.valid)
            out.append(np.asarray(f.desc)[m])
    return np.concatenate(out)


def default_vocabulary(force_rebuild: bool = False,
                       k: int = DEFAULT_K,
                       levels: int = DEFAULT_LEVELS) -> Vocabulary:
    """Load the cached default vocabulary, building it on first use."""
    path = os.path.abspath(os.path.join(
        _DATA_DIR, f"vocab_k{k}_l{levels}.npz"))
    if not force_rebuild and os.path.exists(path):
        z = np.load(path)
        lv = int(z["levels"])
        cents = tuple(z[f"cent{d}"] for d in range(lv))
        return Vocabulary(centroids=cents, idf=z["idf"], k=int(z["k"]),
                          levels=lv)
    desc = harvest_training_descriptors()
    voc = build_vocabulary(desc, k=k, levels=levels)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(
        path, idf=voc.idf, k=voc.k, levels=voc.levels,
        **{f"cent{d}": c for d, c in enumerate(voc.centroids)})
    return voc
