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
  * backpressure: NeedNewKeyFrame consults real mapper idleness
    (Tracking.cc:1127-1160): c1b requires an idle mapper; when busy it
    raises mbAbortBA and only queues while fewer than 3 keyframes wait
  * the worker runs the fused mapping_step (ONE dispatch per keyframe)
    and skips local BA when more keyframes are waiting (mbAbortBA
    semantics, LocalMapping.cc:624-627)
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
        self._worker_busy = False
        self._pending_vis = None   # accumulated counter masks (device)
        self._pending_found = None

    # ------------------------------------------------------------- control
    def start(self):
        self._running = True
        self._worker = threading.Thread(target=self._mapping_loop,
                                        name="local-mapping", daemon=True)
        self._worker.start()

    def shutdown(self, timeout: float = 120.0):
        """RequestFinish + join (LocalMapping.cc:731-755 protocol); also
        drains a background global BA (System::Shutdown spin-waits
        !isRunningGBA, System.cc:435-439)."""
        self._running = False
        self.kf_queue.close()
        if self._worker is not None:
            self._worker.join(timeout=timeout)
        self.finish_gba()

    # -------------------------------------------------- tracking overrides
    def _absorb_track(self, ms2, res) -> None:
        """Accumulate device-side; folded in by the worker at KF insertion
        (single-writer: tracking never mutates the map)."""
        if self._pending_vis is None:
            self._pending_vis = res.visible_mask.astype(jnp.int32)
            self._pending_found = res.found_mask.astype(jnp.int32)
        else:
            self._pending_vis = self._pending_vis + res.visible_mask
            self._pending_found = self._pending_found + res.found_mask

    def _mapper_idle(self) -> bool:
        return self.kf_queue.size() == 0 and not self._worker_busy

    def _mapping_queue_len(self) -> int:
        return self.kf_queue.size()

    def _interrupt_ba(self) -> None:
        self.abort_ba.set(1)

    def _counter_args(self):
        vis, found = self._pending_vis, self._pending_found
        self._pending_vis = None
        self._pending_found = None
        if vis is None:
            return self._zeros_p, self._zeros_p
        return vis, found

    def _create_keyframe(self, fd, res, timestamp: float) -> None:
        """Enqueue instead of processing inline (Tracking::CreateNewKeyFrame
        → LocalMapping::InsertKeyFrame, Tracking.cc:1162/LocalMapping.cc:114).
        """
        tok = self._token
        self._token += 1
        counters = self._counter_args()
        with self._jobs_lock:
            self._jobs[tok] = (fd, res.Tcw, res.assoc,
                               self.frame_id, timestamp, counters)
        self.abort_ba.set(1)             # interrupt a running local BA
        self.kf_queue.push(tok)
        self.last_kf_frame_id = self.frame_id

    # ------------------------------------------------------ mapping worker
    def _mapping_loop(self):
        while True:
            tok = self.kf_queue.pop(timeout_ms=200)
            if tok is None:
                if not self._running and self.kf_queue.size() == 0:
                    return
                continue
            self._worker_busy = True
            try:
                with self._jobs_lock:
                    job = self._jobs.pop(tok)
                fd, Tcw, assoc, frame_id, ts, counters = job

                if not self._free_kf_slots:
                    if not self._capacity_warned:
                        import warnings
                        warnings.warn(
                            "keyframe capacity exhausted in async worker — "
                            "dropping queued keyframe", RuntimeWarning)
                        self._capacity_warned = True
                    continue
                kf_slot = self._take_kf_slot()
                # local BA unless newer keyframes are waiting (mbAbortBA)
                self.abort_ba.consume()
                ba_ok = self.kf_queue.size() == 0
                ms = self._run_mapping_step(
                    self.ms, fd, Tcw, assoc, kf_slot, self.ref_kf,
                    frame_id, ts, ba_ok=ba_ok, counters=counters)

                if self.loop_closer is not None:
                    ms, closed = self.loop_closer.on_keyframe(
                        ms, kf_slot, self.kf_ordinal)
                    ms, _ = self.loop_closer.gba.poll_and_merge(ms)
                    if closed:
                        self.stats["loops_closed"] += 1

                # publish the new snapshot (atomic reference swap)
                self.ms = ms
                self.ref_kf = kf_slot
            finally:
                self._worker_busy = False
