"""Sharded DB scoring wired INSIDE the engine path (VERDICT r4 next #7).

On any multi-device host (tests run on the virtual 8-device CPU mesh,
conftest.py) LoopCloser shards its [K, W] BoW matrix over the mesh and
routes the per-keyframe detection prologue through the partitioned
matvec.  These tests assert (a) the engine really is on the sharded
path, (b) its results are identical to the dense single-device program,
(c) the sharding survives add/erase/reset.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.config import (CameraConfig, CapacityConfig, OrbConfig,
                                 STEREO, SlamConfig)
from orbslam2_tpu.models import map_state as M
from orbslam2_tpu.models import vocabulary as voc_mod
from orbslam2_tpu.runtime import loop_closing


def make_cfg(K=16):
    return SlamConfig(
        camera=CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                            bf=150.0, width=640, height=480, fps=10.0,
                            th_depth=60.0),
        orb=OrbConfig(n_features=64),
        capacity=CapacityConfig(max_keyframes=K, max_map_points=1 << 10,
                                local_ba_keyframes=4, local_ba_points=256),
        sensor=STEREO)


def random_map(cfg, rng, n_kfs=8):
    """MapState with random descriptors/validity on the first n_kfs."""
    ms = M.empty_map(cfg)
    K = cfg.capacity.max_keyframes
    N = cfg.orb.n_features_padded
    desc = rng.integers(0, 2 ** 32, size=(K, N, 8), dtype=np.uint32)
    kp_valid = np.zeros((K, N), bool)
    kp_valid[:n_kfs] = rng.random((n_kfs, N)) < 0.9
    kf_valid = np.zeros((K,), bool)
    kf_valid[:n_kfs] = True
    return ms._replace(
        kf_desc=jnp.asarray(desc),
        kf_kp_valid=jnp.asarray(kp_valid),
        kf_valid=jnp.asarray(kf_valid))


def test_loopcloser_uses_sharded_db():
    cfg = make_cfg()
    voc = voc_mod.default_vocabulary()
    lc = loop_closing.LoopCloser(cfg, voc)
    assert jax.device_count() > 1
    assert lc.mesh is not None
    assert not lc.db.bow.sharding.is_fully_replicated


def test_sharded_detect_step_matches_dense(rng):
    cfg = make_cfg()
    voc = voc_mod.default_vocabulary()
    lc = loop_closing.LoopCloser(cfg, voc)
    dense_step = loop_closing.make_loop_fns(cfg, voc)[-1]
    ms = random_map(cfg, rng)

    import orbslam2_tpu.models.keyframe_db as db_mod
    db_dense = db_mod.KeyFrameDB.empty(cfg.capacity.max_keyframes,
                                       voc.n_words)
    # register a few keyframes through both paths, comparing each step
    for k in range(6):
        db_s, vec_s, info_s = lc.f_detect_step(ms, lc.db, jnp.int32(k))
        lc.db = db_s
        db_dense, vec_d, info_d = dense_step(ms, db_dense, jnp.int32(k))
        np.testing.assert_allclose(np.asarray(vec_s), np.asarray(vec_d),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_array_equal(np.asarray(info_s[:, 0]),
                                      np.asarray(info_d[:, 0]))
        assert not lc.db.bow.sharding.is_fully_replicated

    np.testing.assert_allclose(np.asarray(lc.db.bow),
                               np.asarray(db_dense.bow), rtol=1e-5,
                               atol=1e-7)


def test_sharding_survives_reset_and_erase(rng):
    cfg = make_cfg()
    voc = voc_mod.default_vocabulary()
    lc = loop_closing.LoopCloser(cfg, voc)
    ms = random_map(cfg, rng)
    db2, _, _ = lc.f_detect_step(ms, lc.db, jnp.int32(0))
    lc.db = db2.erase(jnp.int32(0))
    lc.reset_db()
    assert not lc.db.bow.sharding.is_fully_replicated
    assert not bool(np.asarray(lc.db.valid).any())
