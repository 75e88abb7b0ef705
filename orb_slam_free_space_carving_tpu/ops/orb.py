"""Oriented BRIEF descriptors + the full pyramid feature extractor.

TPU re-design of the reference ORB pipeline (``src/ORBextractor.cc``):

- orientation = intensity centroid over a radius-15 circular patch
  (``IC_Angle`` ``:77-106`` with the umax circle ``:452-469``) — here one
  batched 2D gather over precomputed in-circle offsets;
- descriptor = 256 rotated point-pair comparisons on the blurred level
  (``computeOrbDescriptor`` ``:108-145``).  The reference hard-codes the
  learned ``bit_pattern_31_`` table; we deliberately use a seeded
  BRIEF-style Gaussian pattern instead (descriptors only ever meet our own
  matcher, so bit-compatibility with OpenCV is a non-goal; repeatability is
  golden-tested instead).

Feature sets are fixed-capacity struct-of-arrays (static shapes under jit).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_free_space_carving_tpu.config import ORBConfig
from orb_slam_free_space_carving_tpu.ops import fast as fast_ops
from orb_slam_free_space_carving_tpu.ops import pyramid as pyr_ops

HALF_PATCH = 15
DESC_BITS = 256
DESC_BYTES = 32
PATTERN_RADIUS = 13
PATTERN_SEED = 1234


class Features(NamedTuple):
    """Per-frame feature set, padded to static capacity N.

    ``xy`` is in level-0 pixel coordinates (like reference keypoints after
    scaling); ``uv_und`` is filled by the frame builder after undistortion.
    """

    xy: jnp.ndarray        # [N,2] float32, raw (distorted) level-0 coords
    uv_und: jnp.ndarray    # [N,2] float32, undistorted coords
    response: jnp.ndarray  # [N] float32
    angle: jnp.ndarray     # [N] float32 radians
    octave: jnp.ndarray    # [N] int32 pyramid level
    desc: jnp.ndarray      # [N,32] uint8 packed descriptor
    valid: jnp.ndarray     # [N] bool

    @property
    def capacity(self):
        return self.xy.shape[-2]


@functools.lru_cache(maxsize=None)
def _circle_offsets():
    """All integer offsets within the radius-15 intensity-centroid circle."""
    offs = []
    for dy in range(-HALF_PATCH, HALF_PATCH + 1):
        for dx in range(-HALF_PATCH, HALF_PATCH + 1):
            if dx * dx + dy * dy <= HALF_PATCH * HALF_PATCH:
                offs.append((dx, dy))
    return np.array(offs, dtype=np.float32)  # [P,2] (dx,dy)


@functools.lru_cache(maxsize=None)
def _brief_pattern(seed: int = PATTERN_SEED):
    """[256, 2, 2] float32 point pairs ~ N(0, (r/2.5)^2), clipped to radius."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, PATTERN_RADIUS / 2.5, size=(DESC_BITS, 2, 2))
    norm = np.linalg.norm(pts, axis=-1, keepdims=True)
    pts = np.where(norm > PATTERN_RADIUS, pts * (PATTERN_RADIUS / norm), pts)
    return pts.astype(np.float32)


def _gather_image(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-free nearest lookup as a FLAT 1D gather (a single-axis
    jnp.take lowers to a much faster TPU gather than 2D advanced indexing)."""
    h, w = img.shape
    xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, h - 1)
    return jnp.take(img.reshape(-1), yi * w + xi)


def compute_orientation(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid angle (radians) for keypoints xy[N,2] on one level.

    Per-feature patch *gathers* are the slow path on TPU (~7 ms/frame for
    1024 x 961-pixel patches, scripts/probe_fused_parts.py); instead the IC
    moments are computed DENSELY for every pixel with integer column
    prefix-sums (2 cumsums + 31 shifted window-differences, all
    VPU-friendly elementwise work), then each keypoint reads back two
    scalars.  Exact integer arithmetic -> bit-identical angles to the
    gather formulation for any keypoint >= HALF_PATCH from the border
    (guaranteed: detection uses edge_threshold=19 > 15).
    """
    m10, m01 = _moment_maps(img)
    h, w = img.shape
    xi = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, h - 1)
    return jnp.arctan2(
        m01[yi, xi].astype(jnp.float32), m10[yi, xi].astype(jnp.float32)
    )


def _column_extents():
    """u(dx): max |dy| inside the radius-15 IC circle per dx (int tuple)."""
    return tuple(
        int(np.floor(np.sqrt(HALF_PATCH * HALF_PATCH - dx * dx)))
        for dx in range(-HALF_PATCH, HALF_PATCH + 1)
    )


def _shift_rows_clamp(S, k):
    """out[y] = S[y+k] with edge clamping (k > 0 reads below, k < 0 above)."""
    if k == 0:
        return S
    if k > 0:
        return jnp.concatenate([S[k:], jnp.tile(S[-1:], (k, 1))], axis=0)
    return jnp.concatenate([jnp.tile(S[:1], (-k, 1)), S[:k]], axis=0)


def _shift_rows_zero(S, k):
    """out[y] = S[y-k] with zeros above (prefix-sum 'before start' = 0)."""
    return jnp.concatenate(
        [jnp.zeros((k,) + S.shape[1:], S.dtype), S[:-k]], axis=0
    )


def _moment_maps(img: jnp.ndarray):
    """Dense IC moments (m10, m01) int32 [H,W] over the radius-15 circle.

    Overflow note: the row-weighted prefix ``T`` reaches ~255*H^2/2 and wraps
    int32 for images taller than ~4000 px.  That wrap is HARMLESS: XLA
    integer adds are two's-complement modular, every consumed quantity is a
    *difference* of prefixes over a <=31-row window (< 2^31 in true value),
    and modular arithmetic makes such differences exact regardless of
    intermediate wrap.  The final ``m01 = s_rw - rows*s_col`` is likewise a
    small true value (<= 255*31^2*15) of wrapped terms, hence exact for any
    image height.
    """
    img_i = img.astype(jnp.int32)
    H = img.shape[0]
    P = jnp.cumsum(img_i, axis=0)                       # [H,W] column prefix
    rows = jnp.arange(H, dtype=jnp.int32)[:, None]
    T = jnp.cumsum(img_i * rows, axis=0)                # row-weighted prefix
    exts = _column_extents()
    m10 = jnp.zeros_like(P)
    s_col = jnp.zeros_like(P)                           # sum img over circle
    s_rw = jnp.zeros_like(P)                            # sum row*img
    for i, dx in enumerate(range(-HALF_PATCH, HALF_PATCH + 1)):
        u = exts[i]
        # Column sum over rows [y-u, y+u] at column x+dx.
        hi_p = _shift_rows_clamp(P, u)
        lo_p = _shift_rows_zero(P, u + 1)
        cs = jnp.roll(hi_p - lo_p, -dx, axis=1)
        hi_t = _shift_rows_clamp(T, u)
        lo_t = _shift_rows_zero(T, u + 1)
        ts = jnp.roll(hi_t - lo_t, -dx, axis=1)
        m10 = m10 + dx * cs
        s_col = s_col + cs
        s_rw = s_rw + ts
    m01 = s_rw - rows * s_col                           # sum dy*img
    return m10, m01


def compute_descriptors(img_blur: jnp.ndarray, xy: jnp.ndarray, angle: jnp.ndarray
                        ) -> jnp.ndarray:
    """Rotated-BRIEF descriptors: [N,32] uint8 on one pyramid level."""
    pat = jnp.asarray(_brief_pattern())  # [256,2,2]
    ca, sa = jnp.cos(angle), jnp.sin(angle)  # [N]
    # Rotate pattern per keypoint: [N,256,2,2]
    px = pat[None, :, :, 0]
    py = pat[None, :, :, 1]
    rx = ca[:, None, None] * px - sa[:, None, None] * py + xy[:, None, None, 0]
    ry = sa[:, None, None] * px + ca[:, None, None] * py + xy[:, None, None, 1]
    vals = _gather_image(img_blur, rx, ry)  # [N,256,2]
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint8)  # [N,256]
    # Pack 8 bits per byte, LSB-first.
    bits8 = bits.reshape(bits.shape[0], DESC_BYTES, 8)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], dtype=jnp.uint8)
    return jnp.sum(bits8 * weights[None, None, :], axis=-1).astype(jnp.uint8)


def unpack_bits(desc_u8: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[...,32] uint8 -> [...,256] 0/1 in a matmul-friendly dtype.

    Unpacked descriptors turn Hamming distance into an MXU matmul
    (see ops/matching.py).
    """
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (desc_u8[..., :, None] >> shifts) & jnp.uint8(1)
    return bits.reshape(desc_u8.shape[:-1] + (DESC_BITS,)).astype(dtype)


def level_budgets(n_features: int, n_levels: int, scale_factor: float) -> List[int]:
    """Geometric per-level feature budgets (``ORBextractor.cc:435-446``)."""
    factor = 1.0 / scale_factor
    first = n_features * (1 - factor) / (1 - factor ** n_levels)
    budgets = []
    acc = 0
    for l in range(n_levels - 1):
        b = int(round(first * factor ** l))
        budgets.append(b)
        acc += b
    budgets.append(max(n_features - acc, 0))
    return budgets


def extract_features(img_u8: jnp.ndarray, cfg: ORBConfig, capacity: int | None = None,
                     return_pyramid: bool = False):
    """Full ORB extraction: pyramid -> FAST -> orientation -> descriptors.

    Jit-compatible for a fixed image shape; returns Features padded to
    ``capacity`` (default cfg.n_features_pad).  Mirrors
    ``ORBextractor::operator()`` (``src/ORBextractor.cc:1043-1105``).
    With ``return_pyramid`` also returns the level images (for the stereo SAD
    refinement, ops/stereo.py).
    """
    capacity = capacity or cfg.n_features_pad
    levels, blurred = pyr_ops.build_pyramid(img_u8, cfg.n_levels, cfg.scale_factor)
    budgets = level_budgets(cfg.n_features, cfg.n_levels, cfg.scale_factor)

    xs, us, rs, angs, octs, descs, vals = [], [], [], [], [], [], []
    for l in range(cfg.n_levels):
        cap_l = max(8, budgets[l])
        xy, score, valid = fast_ops.detect_level(
            levels[l],
            capacity=cap_l,
            ini_threshold=float(cfg.ini_th_fast),
            min_threshold=float(cfg.min_th_fast),
            cell_size=cfg.cell_size,
            border=cfg.edge_threshold,
        )
        ang = compute_orientation(levels[l], xy)
        desc = compute_descriptors(blurred[l], xy, ang)
        scale = cfg.scale_factor ** l
        xs.append(xy * scale)
        rs.append(score)
        angs.append(ang)
        octs.append(jnp.full((cap_l,), l, dtype=jnp.int32))
        descs.append(desc)
        vals.append(valid)

    xy = jnp.concatenate(xs, axis=0)
    response = jnp.concatenate(rs, axis=0)
    angle = jnp.concatenate(angs, axis=0)
    octave = jnp.concatenate(octs, axis=0)
    desc = jnp.concatenate(descs, axis=0)
    valid = jnp.concatenate(vals, axis=0)

    total = xy.shape[0]
    if total < capacity:
        pad = capacity - total
        xy = jnp.pad(xy, ((0, pad), (0, 0)))
        response = jnp.pad(response, (0, pad))
        angle = jnp.pad(angle, (0, pad))
        octave = jnp.pad(octave, (0, pad))
        desc = jnp.pad(desc, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    elif total > capacity:
        # Keep strongest responses (uniformity already enforced per level/cell).
        order = jnp.argsort(jnp.where(valid, -response, jnp.inf))[:capacity]
        xy, response = xy[order], response[order]
        angle, octave = angle[order], octave[order]
        desc, valid = desc[order], valid[order]

    feat = Features(
        xy=xy,
        uv_und=xy,  # frame builder overwrites with undistorted coords
        response=response,
        angle=angle,
        octave=octave,
        desc=desc,
        valid=valid,
    )
    if return_pyramid:
        return feat, levels
    return feat
