"""Per-frame data: the array analogue of ``Frame`` (src/Frame.cc).

A FrameData is produced by the jitted frontend (extract → undistort →
stereo/RGBD depth) and is immutable.  The reference's 64×48 feature grid
(``Frame::AssignFeaturesToGrid``) has no analogue here — matchers use dense
masked distance matrices instead of grid candidate lists (see ops/matching).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from orbslam2_tpu.config import SlamConfig
from orbslam2_tpu.ops import extractor, image as image_ops, stereo as stereo_ops
from orbslam2_tpu.utils import camera as cam_mod


class FrameData(NamedTuple):
    xy: jax.Array        # [N, 2] undistorted keypoint coords
    xy_raw: jax.Array    # [N, 2] raw (distorted) coords
    level: jax.Array     # [N] int32
    angle: jax.Array     # [N] float32
    response: jax.Array  # [N]
    valid: jax.Array     # [N] bool
    desc: jax.Array      # [N, 8] uint32
    ur: jax.Array        # [N] right-image u coord (−1: mono)
    depth: jax.Array     # [N] stereo/RGBD depth (−1: none)

    @property
    def n(self) -> int:
        return self.xy.shape[0]


def make_frontend_stereo(cfg: SlamConfig):
    """Build the jitted stereo frontend: (left, right) → FrameData.

    Replaces the stereo Frame ctor (src/Frame.cc:61-118): 2-thread L/R ORB
    extraction becomes a batched vmap over the image pair; stereo matching
    and undistortion follow.
    """
    cam = cam_mod.Camera.from_config(cfg.camera)
    orb = cfg.orb

    def frontend(left: jax.Array, right: jax.Array) -> FrameData:
        pair = jnp.stack([left, right])
        feats_pair = jax.vmap(lambda im: extractor.extract(im, orb))(pair)
        fl = jax.tree.map(lambda x: x[0], feats_pair)
        fr = jax.tree.map(lambda x: x[1], feats_pair)
        pyr_l = image_ops.build_pyramid(left, orb.n_levels, orb.scale_factor)
        pyr_r = image_ops.build_pyramid(right, orb.n_levels, orb.scale_factor)
        sm = stereo_ops.match_stereo(fl, fr, pyr_l, pyr_r,
                                     cfg.camera.bf, cfg.camera.fx,
                                     orb.scale_factor)
        xy_und = (cam_mod.undistort_points(cam, fl.xy)
                  if cfg.camera.has_distortion else fl.xy)
        return FrameData(xy=xy_und, xy_raw=fl.xy, level=fl.level,
                         angle=fl.angle, response=fl.response, valid=fl.valid,
                         desc=fl.desc, ur=sm.u_right, depth=sm.depth)

    return jax.jit(frontend)


def make_frontend_rgbd(cfg: SlamConfig):
    """(gray, depth_map) → FrameData (RGBD Frame ctor, src/Frame.cc:120)."""
    cam = cam_mod.Camera.from_config(cfg.camera)
    orb = cfg.orb

    def frontend(gray: jax.Array, depth_map: jax.Array) -> FrameData:
        f = extractor.extract(gray, orb)
        sm = stereo_ops.depth_from_rgbd(f, depth_map, cfg.camera.bf,
                                        depth_factor=1.0)
        xy_und = (cam_mod.undistort_points(cam, f.xy)
                  if cfg.camera.has_distortion else f.xy)
        return FrameData(xy=xy_und, xy_raw=f.xy, level=f.level, angle=f.angle,
                         response=f.response, valid=f.valid, desc=f.desc,
                         ur=sm.u_right, depth=sm.depth)

    return jax.jit(frontend)


def make_frontend_mono(cfg: SlamConfig):
    """gray → FrameData with no depth channel (mono Frame ctor, Frame.cc:175)."""
    cam = cam_mod.Camera.from_config(cfg.camera)
    orb = cfg.orb

    def frontend(gray: jax.Array) -> FrameData:
        f = extractor.extract(gray, orb)
        xy_und = (cam_mod.undistort_points(cam, f.xy)
                  if cfg.camera.has_distortion else f.xy)
        n = f.xy.shape[0]
        neg = jnp.full((n,), -1.0, jnp.float32)
        return FrameData(xy=xy_und, xy_raw=f.xy, level=f.level, angle=f.angle,
                         response=f.response, valid=f.valid, desc=f.desc,
                         ur=neg, depth=neg)

    return jax.jit(frontend)
