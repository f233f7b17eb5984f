"""Distributed bundle adjustment over a device mesh.

The BASELINE.json north star: "keyframes and map-point blocks partition
across hosts, with distributed bundle adjustment reducing per-camera Schur
complements via all-reduce/reduce-scatter over ICI".

Implementation: observations are sharded along the mesh's data axis;
``bundle.bundle_adjust`` runs under jit with sharding constraints, and
GSPMD turns the per-block scatter-add segment sums (Hcc/Hpp/Ucp/g builds)
into local partial sums + ``psum`` over ICI, exactly the reduce of Schur
blocks the north star describes.  Poses/points stay replicated (they are
tiny next to observations), the reduced 6C×6C solve is computed identically
on every device.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from orbslam2_tpu.ops import bundle
from orbslam2_tpu.parallel.mesh import DATA_AXIS, pad_to_multiple
from orbslam2_tpu.utils import camera as cam_mod

_OBS_FIELDS = ("cam_i", "pt_i", "uv", "ur", "inv_sigma2", "valid")


def _put_global(v, sharding):
    """Place a host array under ``sharding``; works on single-process AND
    multi-process meshes (every process holds the same full ``v`` and
    contributes its addressable shards)."""
    import numpy as np
    v = np.asarray(v)
    return jax.make_array_from_callback(v.shape, sharding,
                                        lambda idx: v[idx])


def shard_problem(mesh: Mesh, prob: bundle.BAProblem) -> bundle.BAProblem:
    """Pad observation arrays to the mesh size and lay them out sharded;
    poses/points replicated."""
    n_dev = mesh.devices.size
    O = prob.cam_i.shape[0]
    O_pad = pad_to_multiple(O, n_dev)
    obs_sh = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())

    def pad_obs(x):
        pad = [(0, O_pad - O)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad)

    out = {}
    for f in prob._fields:
        v = getattr(prob, f)
        if f in _OBS_FIELDS:
            # padded rows carry valid=False ⇒ dead observations
            out[f] = _put_global(pad_obs(v), obs_sh)
        else:
            out[f] = _put_global(v, repl)
    return bundle.BAProblem(**out)


@functools.partial(jax.jit, static_argnames=("n_free", "iters_a", "iters_b",
                                             "fix_first_free", "solver"))
def _ba_jit(cam, prob, n_free, iters_a, iters_b, fix_first_free, solver):
    return bundle.bundle_adjust(cam, prob, n_free, iters_a=iters_a,
                                iters_b=iters_b,
                                fix_first_free=fix_first_free, solver=solver)


def distributed_bundle_adjust(
    mesh: Mesh,
    cam: cam_mod.Camera,
    prob: bundle.BAProblem,
    n_free: int,
    iters_a: int = 5,
    iters_b: int = 10,
    fix_first_free: bool = False,
    solver: str = "dense",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (poses, points, obs_inlier[: original O]).

    ``solver="cg"`` runs the matrix-free Schur path (ops/bundle.py):
    per-observation coupling blocks stay sharded with the observations, so
    every CG matvec is local partial segment-sums + one psum of the [C, 6]
    result — the communication volume is O(C) per iteration, independent
    of the observation count, which is what lets global BA ride DCN at
    multi-host sizes."""
    O = prob.cam_i.shape[0]
    sp = shard_problem(mesh, prob)
    with mesh:
        poses, points, inlier = _ba_jit(cam, sp, n_free, iters_a, iters_b,
                                        fix_first_free, solver)
    return poses, points, inlier[:O]
