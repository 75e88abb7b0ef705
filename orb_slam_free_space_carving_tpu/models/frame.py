"""Per-frame container + jitted frame builders (mono / stereo / RGB-D).

TPU re-design of ``Frame`` (reference ``src/Frame.cc``): the mono constructor
(``:174-228``) extracts ORB, undistorts keypoints (``:404-434``) and buckets
them into a 64x48 grid (``:230-245``); the stereo constructor (``:61-119``)
extracts left/right in two threads and runs ``ComputeStereoMatches``
(``:466-641``); the RGB-D constructor (``:121-172``) synthesizes stereo from
the depth map (``ComputeStereoFromRGBD`` ``:643-664``).

Here each build is one jitted function image(s) -> :class:`FrameData`; the
reference's two extraction threads become a single program XLA schedules in
parallel (SURVEY.md P7: "batch dim of extraction kernel"); the feature grid is
unnecessary because the matchers operate on dense masked distance matrices
(``ops/matching.py``) instead of per-cell candidate lists.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_free_space_carving_tpu.config import SystemConfig
from orb_slam_free_space_carving_tpu.ops import orb as orb_ops
from orb_slam_free_space_carving_tpu.ops import stereo as stereo_ops
from orb_slam_free_space_carving_tpu.utils import camera


class FrameData(NamedTuple):
    """One frame's device data (fixed capacity N features).

    ``u_right``/``depth`` are the stereo channels (mvuRight/mvDepth in the
    reference, ``Frame.h:131-133``): -1 where no stereo/depth measurement, and
    None entirely on monocular frames.
    """

    feat: orb_ops.Features
    pose: jnp.ndarray        # [7] Tcw (identity until tracked)
    inv_sigma2: jnp.ndarray  # [N] per-feature information by octave
    u_right: Optional[jnp.ndarray] = None   # [N] right x coord or -1
    depth: Optional[jnp.ndarray] = None     # [N] metric depth or -1


class FrameBuilder:
    """Jit-compiled image(s) -> FrameData for a fixed camera geometry."""

    def __init__(self, cfg: SystemConfig):
        self.cfg = cfg
        self.intr = camera.intrinsics_array(cfg.camera)
        sig2 = np.array(cfg.orb.level_sigma2, np.float32)
        self._inv_sigma2_by_level = jnp.asarray(1.0 / sig2)
        self._level_sigma = jnp.asarray(
            np.array(cfg.orb.scale_factors, np.float32)
        )
        self._build = jax.jit(self._build_impl)
        self._build_stereo = jax.jit(self._build_stereo_impl)
        self._build_rgbd = jax.jit(self._build_rgbd_impl)

    def _finish(self, feat):
        if self.cfg.camera.has_distortion:
            uv_und = camera.undistort_pixels(feat.xy, self.intr)
        else:
            uv_und = feat.xy
        feat = feat._replace(uv_und=uv_und)
        inv_sigma2 = self._inv_sigma2_by_level[
            jnp.clip(feat.octave, 0, self.cfg.orb.n_levels - 1)
        ]
        return feat, inv_sigma2

    def _build_impl(self, img_u8: jnp.ndarray) -> FrameData:
        feat = orb_ops.extract_features(img_u8, self.cfg.orb)
        feat, inv_sigma2 = self._finish(feat)
        from orb_slam_free_space_carving_tpu.utils import lie

        return FrameData(
            feat=feat, pose=lie.se3_identity(), inv_sigma2=inv_sigma2
        )

    def _build_stereo_impl(self, img_l: jnp.ndarray, img_r: jnp.ndarray
                           ) -> FrameData:
        """Stereo ctor: both extractions in one program + ComputeStereoMatches."""
        feat_l, lv_l = orb_ops.extract_features(
            img_l, self.cfg.orb, return_pyramid=True
        )
        feat_r, lv_r = orb_ops.extract_features(
            img_r, self.cfg.orb, return_pyramid=True
        )
        feat_l, inv_sigma2 = self._finish(feat_l)
        u_right, depth = stereo_ops.stereo_match(
            feat_l, feat_r,
            stereo_ops.stack_pyramid(lv_l), stereo_ops.stack_pyramid(lv_r),
            self.cfg.camera.bf, self.intr, self.cfg.orb.scale_factor,
            self._level_sigma, th_high=float(self.cfg.matcher.th_high),
        )
        from orb_slam_free_space_carving_tpu.utils import lie

        return FrameData(
            feat=feat_l, pose=lie.se3_identity(), inv_sigma2=inv_sigma2,
            u_right=u_right, depth=depth,
        )

    def _build_rgbd_impl(self, img_u8: jnp.ndarray, depth_img: jnp.ndarray
                         ) -> FrameData:
        feat = orb_ops.extract_features(img_u8, self.cfg.orb)
        feat, inv_sigma2 = self._finish(feat)
        u_right, depth = stereo_ops.depth_from_rgbd(
            feat, depth_img, self.cfg.camera.depth_map_factor,
            self.cfg.camera.bf,
        )
        from orb_slam_free_space_carving_tpu.utils import lie

        return FrameData(
            feat=feat, pose=lie.se3_identity(), inv_sigma2=inv_sigma2,
            u_right=u_right, depth=depth,
        )

    def __call__(self, img: np.ndarray) -> FrameData:
        assert img.ndim == 2, "frame builder takes grayscale uint8"
        return self._build(jnp.asarray(img, jnp.uint8))

    def stereo(self, img_l: np.ndarray, img_r: np.ndarray) -> FrameData:
        return self._build_stereo(
            jnp.asarray(img_l, jnp.uint8), jnp.asarray(img_r, jnp.uint8)
        )

    def rgbd(self, img: np.ndarray, depth: np.ndarray) -> FrameData:
        return self._build_rgbd(
            jnp.asarray(img, jnp.uint8), jnp.asarray(depth, jnp.float32)
        )
