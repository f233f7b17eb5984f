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


def test_sharded_layout(rng):
    """Observation arrays actually land sharded across the mesh."""
    cam, prob, *_ = _make_ba_problem(rng, n_pts=100)
    mesh = mesh_mod.make_mesh()
    sp = dist_ba.shard_problem(mesh, prob)
    # obs arrays sharded along the data axis, poses replicated
    assert len(sp.uv.sharding.device_set) == 8
    assert not sp.uv.sharding.is_fully_replicated
    assert sp.poses.sharding.is_fully_replicated
    assert sp.uv.shape[0] % 8 == 0
