"""Distributed BA over a virtual 8-device mesh: correctness vs single-device.

The multi-host story (SURVEY.md §2.4 P6): observations sharded across the
mesh, Schur blocks reduced by collectives.  CPU simulation via
xla_force_host_platform_device_count (set in conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.ops import bundle
from orbslam2_tpu.parallel import dist_ba, mesh as mesh_mod
from tests.test_bundle import CAM_CFG, _make_ba_problem, _pose_errors

from orbslam2_tpu.utils import camera as cam_mod


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_distributed_matches_single_device(rng):
    cam, prob, poses_true, pts_true, out_idx = _make_ba_problem(rng)
    mesh = mesh_mod.make_mesh()
    poses_d, points_d, inl_d = dist_ba.distributed_bundle_adjust(
        mesh, cam, prob, n_free=6)
    poses_s, points_s, inl_s = bundle.bundle_adjust(cam, prob, n_free=6)

    # same optimum (not bitwise: reduction orders differ across shards)
    np.testing.assert_allclose(np.asarray(poses_d), np.asarray(poses_s),
                               atol=5e-4)
    et_d, _ = _pose_errors(np.asarray(poses_d), poses_true, 6)
    et_s, _ = _pose_errors(np.asarray(poses_s), poses_true, 6)
    assert et_d.max() < max(2 * et_s.max(), 1e-2)
    # inlier classification agrees almost everywhere
    agree = (np.asarray(inl_d) == np.asarray(inl_s)).mean()
    assert agree > 0.99, agree


def test_partition_by_point(rng):
    """Every observation is routed to the device owning its point block,
    and the padded row → original-index map round-trips."""
    cam, prob, *_ = _make_ba_problem(rng, n_pts=100)
    n_dev = 8
    obs, flat_src, P_pad, O_loc = dist_ba._partition_by_point(prob, n_dev)
    assert P_pad % n_dev == 0
    P_loc = P_pad // n_dev
    O = int(prob.cam_i.shape[0])
    # each real row's point belongs to the device of its row block
    for d in range(n_dev):
        rows = slice(d * O_loc, (d + 1) * O_loc)
        src = flat_src[rows]
        pts = obs["pt_i"][rows][src >= 0]
        assert np.all((pts // P_loc) == d)
    # permutation covers every original observation exactly once
    covered = np.sort(flat_src[flat_src >= 0])
    np.testing.assert_array_equal(covered, np.arange(O))
    # padding rows are invalid
    assert not obs["valid"][flat_src < 0].any()


def test_distributed_cg_matches_single_device(rng):
    """The matrix-free CG path under GSPMD (global-BA-at-scale layout)."""
    cam, prob, poses_true, pts_true, _ = _make_ba_problem(rng)
    mesh = mesh_mod.make_mesh()
    poses_d, points_d, _ = dist_ba.distributed_bundle_adjust(
        mesh, cam, prob, n_free=6, solver="cg")
    poses_s, points_s, _ = bundle.bundle_adjust(
        cam, prob, n_free=6, solver="cg")
    np.testing.assert_allclose(np.asarray(poses_d), np.asarray(poses_s),
                               atol=5e-4)
    et_d, _ = _pose_errors(np.asarray(poses_d), poses_true, 6)
    assert et_d.max() < 0.02


def test_sharded_db_scoring_matches_single_device(rng):
    """Loop-candidate scoring with the [K, W] BoW matrix sharded over the
    mesh returns the same candidates as the replicated query."""
    import jax.numpy as jnp
    from orbslam2_tpu.config import (CameraConfig, CapacityConfig,
                                     OrbConfig, STEREO, SlamConfig)
    from orbslam2_tpu.models import keyframe_db as db_mod
    from orbslam2_tpu.models import map_state as M
    from orbslam2_tpu.parallel import db_shard

    K, W = 16, 1024
    cfg = SlamConfig(
        camera=CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                            bf=150.0, width=640, height=480),
        orb=OrbConfig(n_features=64),
        capacity=CapacityConfig(max_keyframes=K, max_map_points=256),
        sensor=STEREO)
    ms = M.empty_map(cfg)
    ms = ms._replace(kf_valid=jnp.asarray(rng.random(K) < 0.9))
    db = db_mod.KeyFrameDB.empty(K, W)
    for k in range(K):
        v = rng.random(W).astype(np.float32)
        v /= np.linalg.norm(v)
        db = db.add(jnp.int32(k), jnp.asarray(v))
    q = rng.random(W).astype(np.float32)
    q /= np.linalg.norm(q)
    q = jnp.asarray(q)

    cands_s, scores_s = db_mod.detect_candidates(
        db, ms, q, jnp.int32(-1), jnp.float32(0.0), 8)

    mesh = mesh_mod.make_mesh()
    db_sh = db_shard.shard_db(mesh, db)
    assert not db_sh.bow.sharding.is_fully_replicated
    cands_d, scores_d = db_shard.detect_candidates_sharded(
        mesh, db_sh, ms, q, jnp.int32(-1), jnp.float32(0.0), 8)
    np.testing.assert_array_equal(np.asarray(cands_s), np.asarray(cands_d))
    np.testing.assert_allclose(np.asarray(scores_s), np.asarray(scores_d),
                               rtol=1e-5)
