"""Sharded loop-candidate scoring over the keyframe database.

SURVEY.md §2.4 P6 / BASELINE north star: "loop-closure candidate scoring
sharded across the keyframe DB".  The database is a dense [K, W] BoW
matrix (models/keyframe_db.py); at production scale the W ≈ 10⁴–10⁶ word
axis dominates memory, so rows are sharded over the mesh's data axis and
the query matvec runs as local [K/D, W]·[W] partials — no replication of
the DB, one all-gather of the [K] score vector (tiny) at the end.  The
covisibility-group accumulation operates on [K]-sized objects and stays
replicated.

Cross-host placement: on a multi-host mesh the same PartitionSpec lays
keyframe rows across hosts; the all-gather of [K] scores is the only DCN
traffic per query.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from orbslam2_tpu.models import keyframe_db as db_mod
from orbslam2_tpu.models import map_state as M
from orbslam2_tpu.parallel.mesh import DATA_AXIS


def shard_db(mesh: Mesh, db: db_mod.KeyFrameDB) -> db_mod.KeyFrameDB:
    """Lay the DB rows out over the mesh (K must divide the device count
    or pad upstream; max_keyframes is a power of two in practice)."""
    row_sh = NamedSharding(mesh, P(DATA_AXIS))
    return db_mod.KeyFrameDB(
        bow=jax.device_put(db.bow, NamedSharding(mesh, P(DATA_AXIS, None))),
        valid=jax.device_put(db.valid, row_sh))


def detect_candidates_sharded(
    mesh: Mesh,
    db: db_mod.KeyFrameDB,
    ms: M.MapState,
    query_bow: jax.Array,
    query_kf: jax.Array,
    min_score: jax.Array,
    n_candidates: int,
) -> Tuple[jax.Array, jax.Array]:
    """Sharded DetectLoopCandidates: same results as the single-device
    ``keyframe_db.detect_candidates`` — GSPMD partitions the [K, W] matvec
    across the mesh and gathers the [K] scores."""
    with mesh:
        out_sh = NamedSharding(mesh, P())

        @jax.jit
        def run(db, ms, vec, qkf, mscore):
            cands, scores = db_mod.detect_candidates(
                db, ms, vec, qkf, mscore, n_candidates)
            return (jax.lax.with_sharding_constraint(cands, out_sh),
                    jax.lax.with_sharding_constraint(scores, out_sh))

        return run(db, ms, query_bow, query_kf, min_score)
