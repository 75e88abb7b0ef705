"""Per-frame container + jitted frame builder.

TPU re-design of ``Frame`` (reference ``src/Frame.cc``): the mono constructor
(``:174-228``) extracts ORB, undistorts keypoints (``:404-434``) and buckets
them into a 64x48 grid (``:230-245``).  Here the whole build is one jitted
function image -> :class:`FrameData`; the grid is unnecessary because the
matchers operate on dense masked distance matrices (``ops/matching.py``)
instead of per-cell candidate lists.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_free_space_carving_tpu.config import SystemConfig
from orb_slam_free_space_carving_tpu.ops import orb as orb_ops
from orb_slam_free_space_carving_tpu.utils import camera


class FrameData(NamedTuple):
    """One frame's device data (fixed capacity N features)."""

    feat: orb_ops.Features
    pose: jnp.ndarray        # [7] Tcw (identity until tracked)
    inv_sigma2: jnp.ndarray  # [N] per-feature information by octave


class FrameBuilder:
    """Jit-compiled image -> FrameData for a fixed camera geometry."""

    def __init__(self, cfg: SystemConfig):
        self.cfg = cfg
        self.intr = camera.intrinsics_array(cfg.camera)
        sig2 = np.array(cfg.orb.level_sigma2, np.float32)
        self._inv_sigma2_by_level = jnp.asarray(1.0 / sig2)
        self._build = jax.jit(self._build_impl)

    def _build_impl(self, img_u8: jnp.ndarray) -> FrameData:
        feat = orb_ops.extract_features(img_u8, self.cfg.orb)
        if self.cfg.camera.has_distortion:
            uv_und = camera.undistort_pixels(feat.xy, self.intr)
        else:
            uv_und = feat.xy
        feat = feat._replace(uv_und=uv_und)
        inv_sigma2 = self._inv_sigma2_by_level[
            jnp.clip(feat.octave, 0, self.cfg.orb.n_levels - 1)
        ]
        from orb_slam_free_space_carving_tpu.utils import lie

        return FrameData(
            feat=feat, pose=lie.se3_identity(), inv_sigma2=inv_sigma2
        )

    def __call__(self, img: np.ndarray) -> FrameData:
        assert img.ndim == 2, "frame builder takes grayscale uint8"
        return self._build(jnp.asarray(img, jnp.uint8))
