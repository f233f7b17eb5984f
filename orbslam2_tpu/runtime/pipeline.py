"""Asynchronous tracking/mapping pipeline.

The reference runs Tracking in the caller's thread and LocalMapping +
LoopClosing in their own threads, talking through keyframe queues and
interrupt flags (System.cc:104-112, LocalMapping::mlNewKeyFrames,
mbAbortBA; SURVEY.md §2.4 P1/P2).  This module reproduces that contract on
top of the functional MapState:

  * single-writer ownership — the mapping worker owns the authoritative
    MapState; tracking reads immutable snapshots (no mutex web; the
    published reference swap is the only synchronization point)
  * the keyframe queue is the native C++ token queue (csrc/slamrt.cpp),
    with payloads handed over in a dict
  * backpressure: tracking raises the abort flag on insertion; the worker
    skips local BA when more keyframes are waiting (mbAbortBA semantics,
    LocalMapping.cc:624-627) and catches up
  * per-frame visible/found counter masks accumulate device-side between
    keyframes and are folded in at insertion (the reference updates them
    under the map mutex per frame)
"""

from __future__ import annotations

import threading
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.config import SlamConfig
from orbslam2_tpu.runtime import tracking
from orbslam2_tpu.runtime.native import InterruptFlag, TokenQueue
from orbslam2_tpu.runtime.slam import SlamEngine


class AsyncSlamEngine(SlamEngine):
    """Pipeline-parallel engine: call track_* from the tracking thread,
    mapping work happens concurrently.  Call start() first, shutdown() at
    the end (drains the queue)."""

    def __init__(self, cfg: SlamConfig, enable_loop_closing: bool = True,
                 vocabulary=None, queue_capacity: int = 8):
        super().__init__(cfg, enable_loop_closing=enable_loop_closing,
                         vocabulary=vocabulary)
        self.kf_queue = TokenQueue(queue_capacity)
        self.abort_ba = InterruptFlag()
        self._jobs: Dict[int, tuple] = {}
        self._jobs_lock = threading.Lock()
        self._token = 0
        self._worker: Optional[threading.Thread] = None
        self._running = False
        self._pending_vis = None   # accumulated counter masks (device)
        self._pending_found = None
        self._n_queued = 0

    # ------------------------------------------------------------- control
    def start(self):
        self._running = True
        self._worker = threading.Thread(target=self._mapping_loop,
                                        name="local-mapping", daemon=True)
        self._worker.start()

    def shutdown(self, timeout: float = 120.0):
        """RequestFinish + join (LocalMapping.cc:731-755 protocol)."""
        self._running = False
        self.kf_queue.close()
        if self._worker is not None:
            self._worker.join(timeout=timeout)

    # -------------------------------------------------- tracking overrides
    def _absorb_track_counters(self, res) -> None:
        """Accumulate device-side; folded in by the worker at KF insertion
        (single-writer: tracking never mutates the map)."""
        if self._pending_vis is None:
            self._pending_vis = res.visible_mask.astype(jnp.int32)
            self._pending_found = res.found_mask.astype(jnp.int32)
        else:
            self._pending_vis = self._pending_vis + res.visible_mask
            self._pending_found = self._pending_found + res.found_mask

    def _create_keyframe(self, fd, res, timestamp: float) -> None:
        """Enqueue instead of processing inline (Tracking::CreateNewKeyFrame
        → LocalMapping::InsertKeyFrame, Tracking.cc:1162/LocalMapping.cc:114).
        """
        tok = self._token
        self._token += 1
        with self._jobs_lock:
            self._jobs[tok] = (fd, np.asarray(res.Tcw), res.assoc,
                               self.frame_id, timestamp,
                               self._pending_vis, self._pending_found)
        self._pending_vis = None
        self._pending_found = None
        self.abort_ba.set(1)             # interrupt a running local BA
        self.kf_queue.push(tok)
        self._n_queued += 1
        self.last_kf_frame_id = self.frame_id

    # ------------------------------------------------------ mapping worker
    def _mapping_loop(self):
        while True:
            tok = self.kf_queue.pop(timeout_ms=200)
            if tok is None:
                if not self._running and self.kf_queue.size() == 0:
                    return
                continue
            with self._jobs_lock:
                job = self._jobs.pop(tok)
            fd, Tcw, assoc, frame_id, ts, vis, found = job
            ms = self.ms
            if vis is not None:
                ms = self.f_apply_counters(ms, vis > 0, found > 0)

            kf_slot = self.n_kfs
            if kf_slot >= self.cfg.capacity.max_keyframes - 1:
                continue
            ms, n_new = self.f_insert_kf(
                ms, fd, jnp.asarray(Tcw, jnp.float32), assoc,
                jnp.int32(kf_slot), jnp.int32(self.mp_top),
                jnp.int32(self.ref_kf), jnp.int32(frame_id),
                jnp.float32(ts))
            self.mp_top = min(self.mp_top + int(n_new),
                              self.cfg.capacity.max_map_points)
            self.n_kfs += 1
            self.stats["kf_inserted"] += 1
            self.stats["mp_created"] += int(n_new)

            ms, n_culled = self.f_cull_mp(ms, jnp.int32(kf_slot))
            self.stats["mp_culled"] += int(n_culled)
            if self.n_kfs >= 2 and self.abort_ba.get() == 0:
                w = np.asarray(self.f_covis_row(ms, jnp.int32(kf_slot)))
                for nb in np.argsort(-w)[:2]:
                    if w[nb] < 15 or \
                            self.mp_top >= self.cfg.capacity.max_map_points:
                        break
                    tri = self.f_triangulate(ms, jnp.int32(kf_slot),
                                             jnp.int32(int(nb)))
                    ms, n_tri = self.f_insert_tri(
                        ms, jnp.int32(kf_slot), jnp.int32(int(nb)), tri,
                        jnp.int32(self.mp_top))
                    self.mp_top += int(n_tri)
                    self.stats["mp_created"] += int(n_tri)
            ms, n_merged = self.f_fuse(ms, jnp.int32(kf_slot))
            self.stats["mp_fused"] += int(n_merged)

            # local BA unless newer keyframes are waiting (mbAbortBA)
            self.abort_ba.consume()
            if self.n_kfs >= 3 and self.kf_queue.size() == 0:
                ms, n_out = self.f_local_ba(ms, jnp.int32(kf_slot))
                self.stats["ba_outliers"] += int(n_out)
            if self.n_kfs >= 5:
                ms, culled = self.f_cull_kf(ms, jnp.int32(kf_slot))
                self.stats["kf_culled"] += int(culled)

            if self.loop_closer is not None:
                self.loop_closer.add_keyframe(ms, kf_slot)
                ms, closed = self.loop_closer.process(ms, kf_slot,
                                                      self.n_kfs)
                if closed:
                    self.stats["loops_closed"] += 1

            # publish the new snapshot (atomic reference swap)
            self.ms = ms
            self.ref_kf = kf_slot
