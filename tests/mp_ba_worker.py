"""Worker for the multi-process distributed-BA test (test_multiprocess.py).

Each process owns 2 virtual CPU devices; jax.distributed stitches them
into one 4-device global mesh (cross-process collectives ride Gloo — the
CPU stand-in for DCN, SURVEY.md §5 "distributed communication backend").

Usage: python mp_ba_worker.py <process_id> <num_processes> <port>
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from orbslam2_tpu.ops import bundle                      # noqa: E402
from orbslam2_tpu.parallel import dist_ba, mesh as mesh_mod  # noqa: E402
from tests.test_bundle import _make_ba_problem, _pose_errors  # noqa: E402

assert jax.device_count() == 2 * nproc, jax.device_count()

rng = np.random.default_rng(0)       # identical problem in every process
cam, prob, poses_true, pts_true, _ = _make_ba_problem(rng, n_pts=200)

mesh = mesh_mod.make_mesh()          # global mesh across both processes
poses_d, points_d, _ = dist_ba.distributed_bundle_adjust(
    mesh, cam, prob, n_free=6, solver="cg")

# cross-process shards: fetch the (replicated) result locally
poses_np = np.asarray(jax.device_get(poses_d))
et, er = _pose_errors(poses_np, poses_true, 6)
assert et.max() < 0.02, et
assert er.max() < 0.1, er
print(f"[proc {pid}] MP-BA OK err_t={et.max():.4f}", flush=True)
