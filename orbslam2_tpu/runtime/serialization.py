"""Map checkpoint/resume.

Replaces ``System::SaveMap/LoadMap`` (src/System.cc:831-874), which boost-
serializes the entire pointer graph (KeyFrame/MapPoint/covisibility/
spanning tree, KeyFrame.cc:671-741 + BoostArchiver.h).  Our map is already
array-structured, so a checkpoint is one compressed npz of the MapState
fields, the keyframe-DB BoW matrix, and the engine counters — and loading
is trivially O(arrays) instead of a pointer-graph fixup.  Like the
reference, the vocabulary is NOT serialized (System.cc:862-869 re-attaches
it on load).
"""

from __future__ import annotations

import json
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.models import keyframe_db as db_mod
from orbslam2_tpu.models import map_state as M


def save_map(path: str, ms: M.MapState, db: Optional[db_mod.KeyFrameDB],
             counters: dict) -> None:
    arrays = {f"ms_{k}": np.asarray(v) for k, v in ms._asdict().items()}
    if db is not None:
        arrays["db_bow"] = np.asarray(db.bow)
        arrays["db_valid"] = np.asarray(db.valid)
    arrays["counters_json"] = np.frombuffer(
        json.dumps(counters).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_map(path: str) -> Tuple[M.MapState, Optional[db_mod.KeyFrameDB],
                                 dict]:
    z = np.load(path)
    ms = M.MapState(**{k: jnp.asarray(z[f"ms_{k}"])
                       for k in M.MapState._fields})
    db = None
    if "db_bow" in z:
        db = db_mod.KeyFrameDB(bow=jnp.asarray(z["db_bow"]),
                               valid=jnp.asarray(z["db_valid"]))
    counters = json.loads(bytes(z["counters_json"]).decode())
    return ms, db, counters
