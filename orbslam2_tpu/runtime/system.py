"""The System facade — public API parity with ``System`` (include/System.h).

Mirrors the reference surface (System.h:72-149): constructor from
(vocabulary, settings, sensor, flags), per-frame entries Track{Stereo,RGBD,
IRD,Monocular}, localization-mode switching, Reset/Shutdown, trajectory
savers, covariance output, GetMap, map save/load.  The three reference
threads (System.cc:104-112) map to the synchronous engine by default or the
native-queue async pipeline (runtime/pipeline.py).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.config import MONOCULAR, RGBD, STEREO, SlamConfig
from orbslam2_tpu.runtime import serialization, tracking
from orbslam2_tpu.runtime.slam import SlamEngine
from orbslam2_tpu.utils import trajectory as traj_mod
from orbslam2_tpu.utils.hpose import HPose


class System:
    """Facade with the reference's constructor contract (System.cc:34):
    System(voc_file, settings_file, sensor, use_viewer, save_map, replayer).
    """

    def __init__(self, voc_file: Optional[str], settings_file: Optional[str],
                 sensor: int = STEREO, use_viewer: bool = False,
                 save_map: bool = False, replayer: bool = False,
                 config: Optional[SlamConfig] = None):
        if config is not None:
            self.cfg = config.replace(sensor=sensor)
        elif settings_file:
            self.cfg = SlamConfig.from_yaml(settings_file, sensor=sensor)
        else:
            self.cfg = SlamConfig(sensor=sensor)
        self.sensor = sensor
        self.save_map_on_shutdown = save_map
        self.replayer = replayer
        self.use_viewer = use_viewer

        voc = None
        if voc_file and os.path.exists(voc_file):
            from orbslam2_tpu.models.vocabulary import Vocabulary
            z = np.load(voc_file)
            levels = int(z["levels"])
            voc = Vocabulary(
                centroids=tuple(z[f"cent{d}"] for d in range(levels)),
                idf=z["idf"], k=int(z["k"]), levels=levels)
        self.engine = SlamEngine(self.cfg, vocabulary=voc)

        # map reload (System.cc:55-66 + LoadMap): flips into
        # localization-ready state — first frame relocalizes
        self.map_file = self.cfg.map_file
        if self.map_file and os.path.exists(self.map_file):
            self.load_map(self.map_file)

        self._shutdown = False

    # ------------------------------------------------------ frame entries --
    def _replayer_sync(self):
        """Replayer handshake (System.cc:169-183): in replayer mode a frame
        is not processed while a global BA is still running — the replay
        clock waits for the heavy correction instead of racing it."""
        if self.replayer and self.engine.loop_closer is not None \
                and self.engine.loop_closer.gba.running:
            self.engine.finish_gba()

    def track_stereo(self, left: np.ndarray, right: np.ndarray,
                     timestamp: float) -> Optional[np.ndarray]:
        """System::TrackStereo (System.cc:127)."""
        assert self.sensor == STEREO
        self._replayer_sync()
        return self.engine.track_stereo(left, right, timestamp)

    def track_rgbd(self, im: np.ndarray, depth: np.ndarray,
                   timestamp: float) -> Optional[np.ndarray]:
        """System::TrackRGBD (System.cc:194)."""
        assert self.sensor == RGBD
        self._replayer_sync()
        return self.engine.track_rgbd(im, depth, timestamp)

    def track_ird(self, ir: np.ndarray, depth: np.ndarray,
                  timestamp: float) -> Optional[HPose]:
        """System::TrackIRD (System.cc:247): RGBD tracking + HPose output in
        the world frame (ORB→world axis remap, System.cc:298-319)."""
        assert self.sensor == RGBD
        Tcw = self.engine.track_rgbd(ir, depth, timestamp)
        if Tcw is None:
            return None
        return HPose.from_Tcw(Tcw).to_world_frame()

    def track_monocular(self, im: np.ndarray, timestamp: float
                        ) -> Optional[np.ndarray]:
        """System::TrackMonocular (System.cc:325)."""
        assert self.sensor == MONOCULAR
        self._replayer_sync()
        return self.engine.track_monocular(im, timestamp)

    def change_calibration(self, settings_file: str) -> None:
        """Tracking::ChangeCalibration (Tracking.cc:1656): swap camera
        intrinsics/distortion/bf from a new settings file while KEEPING the
        map.  The reference rewrites mK/mDistCoef and re-triggers
        mbInitialComputations; here the camera is baked into the compiled
        programs as closure constants, so the engine's pipelines are
        rebuilt around the new calibration and the live state (map,
        trajectory, counters, loop-closing DB) is transplanted."""
        new_cam = SlamConfig.from_yaml(settings_file,
                                       sensor=self.sensor).camera
        self.cfg = self.cfg.replace(camera=new_cam)
        old = self.engine
        if hasattr(old, "flush"):
            # windowed engines hold up to window-1 buffered frames plus an
            # in-flight window and deferred keyframe stats — retire them
            # under the OLD calibration before transplanting (ADVICE r4)
            old.flush()
        lc = old.loop_closer
        kw = {}
        if type(old).__name__ == "WindowedSlamEngine":
            kw["window"] = old.window
        self.engine = type(old)(self.cfg, enable_loop_closing=lc is not None,
                                vocabulary=None if lc is None else lc.voc,
                                **kw)
        for attr in ("ms", "state", "n_kfs", "kf_ordinal", "n_live_points",
                     "frame_id", "last_kf_frame_id", "ref_kf", "velocity",
                     "last_Tcw", "last_assoc", "last_inlier", "trajectory",
                     "localization_only", "_free_kf_slots", "_culled_remap",
                     "stats"):
            setattr(self.engine, attr, getattr(old, attr))
        if lc is not None:
            nlc = self.engine.loop_closer
            nlc.db = lc.db
            nlc.consistent_groups = lc.consistent_groups
            nlc.prev_loops = lc.prev_loops
            nlc.last_loop_kf = lc.last_loop_kf

    # ------------------------------------------------------------- modes --
    def activate_localization_mode(self):
        """System::ActivateLocalizationMode (System.cc:377): tracking
        continues, mapping stops."""
        self.engine.localization_only = True

    def deactivate_localization_mode(self):
        self.engine.localization_only = False

    def reset(self):
        """System::Reset (System.cc:402): clear map/DB/trajectory."""
        lc = self.engine.loop_closer
        self.engine = SlamEngine(
            self.cfg, enable_loop_closing=lc is not None,
            vocabulary=None if lc is None else lc.voc)

    def shutdown(self):
        """System::Shutdown (System.cc:415): drain threads + a running GBA
        (spin-wait !isRunningGBA, :435-439), then optionally save the map."""
        if hasattr(self.engine, "shutdown"):
            self.engine.shutdown()          # async pipeline drains itself
        else:
            self.engine.finish_gba()
        if self.save_map_on_shutdown and self.map_file:
            self.save_map(self.map_file)
        self._shutdown = True

    # ------------------------------------------------------------ queries --
    def get_tracking_state(self) -> int:
        return self.engine.state

    def map_changed(self) -> bool:
        """System::MapChanged (big-change counter, Map.cc:70-80)."""
        return self.engine.stats["loops_closed"] > 0 or \
            self.engine.stats["kf_inserted"] > 0

    def get_map(self) -> np.ndarray:
        """System::GetMap (System.cc:793): live point cloud [P, 3]."""
        return self.engine.map_points()

    def get_current_covariance(self) -> Optional[np.ndarray]:
        """System::GetCurrentCovarianceMatrix (System.cc:703-790): 6×6 pose
        covariance from the inverse Gauss-Newton Hessian of the last pose
        optimization (Geneva/Eckenhoff/Huang formulation)."""
        return self.engine.current_pose_covariance()

    def get_current_covariance_world(self) -> Optional[np.ndarray]:
        """6×6 covariance in the SAME world frame TrackIRD's HPose uses
        (ORB camera axes → world: x_w=z, y_w=−x, z_w=−y, System.cc:298-319)
        — the fusion consumer of TrackIRD gets pose AND covariance in one
        frame.  Rotation/translation blocks transform by the fixed axis
        permutation: Σ_w = J Σ Jᵀ with J = diag(R_p, R_p)."""
        cov = self.engine.current_pose_covariance()
        if cov is None:
            return None
        Rp = np.array([[0.0, 0.0, 1.0],
                       [-1.0, 0.0, 0.0],
                       [0.0, -1.0, 0.0]])
        J = np.zeros((6, 6))
        J[:3, :3] = Rp           # rotation (so3) block
        J[3:, 3:] = Rp           # translation block
        return J @ cov @ J.T

    def get_tracked_points(self) -> int:
        if self.engine.last_assoc is None:
            return 0
        return int(jnp.sum(self.engine.last_assoc >= 0))

    # ----------------------------------------------------------- exports --
    def save_trajectory_tum(self, path: str):
        """System::SaveTrajectoryTUM (System.cc:448)."""
        poses = self.engine.frame_poses()
        ts = [e.timestamp for e in self.engine.trajectory]
        traj_mod.save_tum(path, ts, poses)

    def save_keyframe_trajectory_tum(self, path: str):
        """System::SaveKeyFrameTrajectoryTUM (System.cc:508)."""
        ms = self.engine.ms
        valid = np.asarray(ms.kf_valid)
        poses = [np.asarray(ms.kf_pose[k]) for k in np.where(valid)[0]]
        ts = [float(np.asarray(ms.kf_timestamp[k]))
              for k in np.where(valid)[0]]
        traj_mod.save_tum(path, ts, poses)

    def save_trajectory_kitti(self, path: str):
        """System::SaveTrajectoryKITTI (System.cc:546)."""
        traj_mod.save_kitti(path, self.engine.frame_poses())

    # --------------------------------------------------------- checkpoint --
    def save_map(self, path: str):
        lc = self.engine.loop_closer
        serialization.save_map(
            path, self.engine.ms, None if lc is None else lc.db,
            {"n_kfs": self.engine.n_kfs,
             "kf_ordinal": self.engine.kf_ordinal,
             "frame_id": self.engine.frame_id})

    def load_map(self, path: str):
        ms, db, counters = serialization.load_map(path)
        self.engine.ms = ms
        if db is not None and self.engine.loop_closer is not None:
            lc = self.engine.loop_closer
            if lc.mesh is not None:
                from orbslam2_tpu.parallel import db_shard
                db = db_shard.shard_db(lc.mesh, db)
            lc.db = db
        kf_valid = np.asarray(ms.kf_valid)
        self.engine.n_kfs = counters.get("n_kfs", int(kf_valid.sum()))
        self.engine.kf_ordinal = counters.get(
            "kf_ordinal", counters.get("n_kfs", int(kf_valid.sum())))
        self.engine._free_kf_slots = set(np.where(~kf_valid)[0].tolist())
        self.engine.frame_id = counters["frame_id"]
        # localization-ready: first frame relocalizes (Tracking.cc:157-158)
        self.engine.state = tracking.LOST
        self.engine.last_Tcw = np.eye(4, dtype=np.float32)
        N = self.cfg.orb.n_features_padded
        self.engine.last_assoc = jnp.full((N,), -1, jnp.int32)
        self.engine.last_inlier = jnp.zeros((N,), bool)
        self.engine.localization_only = True
