"""Unit tests for the gather/scatter map-state helpers that replaced the
[K, P] incidence materializations (VERDICT r2 weak #3), and for the
free-slot map-point allocator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.config import (CameraConfig, CapacityConfig, OrbConfig,
                                 STEREO, SlamConfig)
from orbslam2_tpu.models import map_state as M


def _random_map(rng, K=12, N=40, P=160):
    cfg = SlamConfig(
        camera=CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                            bf=150.0, width=640, height=480),
        orb=OrbConfig(n_features=N),
        capacity=CapacityConfig(max_keyframes=K, max_map_points=P),
        sensor=STEREO)
    ms = M.empty_map(cfg)
    Np = ms.N                      # feature arrays are padded to ms.N
    kf_valid = rng.random(K) < 0.8
    kf_valid[0] = True
    kp_valid = rng.random((K, Np)) < 0.9
    kp_valid[:, N:] = False        # padding tail carries no features
    # at most one feature per (kf, point) — the real-map invariant
    # (resolve_duplicates / add_observations maintain it)
    kf_mp = np.full((K, Np), -1, np.int32)
    for k in range(K):
        ids = rng.choice(P, size=N, replace=False)
        drop = rng.random(N) < 0.5
        kf_mp[k, :N] = np.where(drop, -1, ids)
    mp_valid = rng.random(P) < 0.7
    ms = ms._replace(
        kf_valid=jnp.asarray(kf_valid),
        kf_kp_valid=jnp.asarray(kp_valid),
        kf_mp=jnp.asarray(kf_mp),
        mp_valid=jnp.asarray(mp_valid))
    return ms


def test_covisibility_row_matches_dense(rng):
    ms = _random_map(rng)
    inc = np.asarray(M.obs_incidence(ms)).astype(np.float64)
    W_dense = inc @ inc.T
    for kf in range(ms.K):
        if not bool(ms.kf_valid[kf]):
            continue
        row = np.asarray(M.covisibility_row(ms, jnp.int32(kf)))
        expect = W_dense[kf].copy()
        expect[kf] = 0
        expect = np.where(np.asarray(ms.kf_valid), expect, 0)
        np.testing.assert_array_equal(row, expect.astype(np.int32))


def test_points_of_kfs_matches_dense(rng):
    ms = _random_map(rng)
    inc = np.asarray(M.obs_incidence(ms))
    mask = np.asarray(rng.random(ms.K) < 0.5)
    got = np.asarray(M.points_of_kfs(ms, jnp.asarray(mask)))
    expect = inc[mask].any(axis=0) if mask.any() else np.zeros(ms.P, bool)
    np.testing.assert_array_equal(got, expect)


def test_kf_share_counts_matches_dense(rng):
    ms = _random_map(rng)
    inc = np.asarray(M.obs_incidence(ms))
    mp_mask = np.asarray(rng.random(ms.P) < 0.4)
    got = np.asarray(M.kf_share_counts(ms, jnp.asarray(mp_mask)))
    expect = (inc & mp_mask[None, :]).sum(axis=1)
    np.testing.assert_array_equal(got, expect.astype(np.int32))


def test_alloc_mp_slots_reuses_free_rows(rng):
    ms = _random_map(rng)
    n_free = int(np.sum(~np.asarray(ms.mp_valid)))
    ok = jnp.asarray(rng.random(ms.N) < 0.5)
    slots, ok2 = M.alloc_mp_slots(ms, ok)
    slots, ok2 = np.asarray(slots), np.asarray(ok2)
    n_req = int(np.sum(np.asarray(ok)))
    assert int(ok2.sum()) == min(n_req, n_free)
    # allocated slots are free and unique
    chosen = slots[ok2]
    assert len(np.unique(chosen)) == len(chosen)
    assert not np.asarray(ms.mp_valid)[chosen].any()


def test_alloc_mp_slots_full_map(rng):
    ms = _random_map(rng)
    ms = ms._replace(mp_valid=jnp.ones((ms.P,), bool))
    ok = jnp.ones((ms.N,), bool)
    _, ok2 = M.alloc_mp_slots(ms, ok)
    assert int(np.asarray(ok2).sum()) == 0


def test_distinctive_descriptor_min_median():
    """MapPoint::ComputeDistinctiveDescriptors (MapPoint.cc:242): the
    representative is the stored descriptor with minimum median Hamming
    distance to the others — two similar observations beat one outlier."""
    cfg = SlamConfig(
        camera=CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                            bf=150.0, width=640, height=480),
        orb=OrbConfig(n_features=8),
        capacity=CapacityConfig(max_keyframes=4, max_map_points=32),
        sensor=STEREO)
    ms = M.empty_map(cfg)
    Np = ms.N

    def desc_row(words):
        d = np.zeros((Np, 8), np.uint32)
        d[0] = words
        return jnp.asarray(d)

    a1 = [0xFFFF0000] * 8
    a2 = [0xFFFF0001] * 8            # 8 bits from a1
    b = [0x0000FFFF] * 8             # ~256 bits from a1
    # one map point observed by three keyframes
    ms = ms._replace(mp_valid=ms.mp_valid.at[5].set(True),
                     mp_pos=ms.mp_pos.at[5].set(jnp.asarray([0., 0., 5.])))
    feat = jnp.arange(Np, dtype=jnp.int32)
    mp = jnp.full((Np,), -1, jnp.int32).at[0].set(5)
    ok = jnp.zeros((Np,), bool).at[0].set(True)
    for k, words in enumerate((a1, b, a2)):
        ms = ms._replace(kf_desc=ms.kf_desc.at[k].set(desc_row(words)),
                         kf_valid=ms.kf_valid.at[k].set(True))
        ms = M.add_observations(ms, jnp.int32(k), feat, mp, ok, 1.2, 8)

    rep = np.asarray(ms.mp_desc[5])
    assert (rep == np.asarray(a1, np.uint32)).all() or \
           (rep == np.asarray(a2, np.uint32)).all(), rep
    assert int(ms.mp_desc_n[5]) == 3
