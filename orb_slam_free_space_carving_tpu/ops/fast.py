"""FAST corner detection as dense batched array ops.

TPU-first re-design of ``ORBextractor::ComputeKeyPointsOctTree`` (reference
``src/ORBextractor.cc:765-853``): instead of per-cell scalar FAST calls plus a
recursive quadtree (``DistributeOctTree``, ``:539-763``), the whole level is
evaluated as one dense VPU computation — 16 shifted copies of the image,
contiguous-arc tests as boolean reductions, SAD corner score, 3x3 NMS — and the
quadtree's spatial-uniformity role is played by a per-cell top-k with the
reference's high->low threshold fallback (ini_th=20 -> min_th=7, ``:769-829``).

Everything has static shapes; detections are fixed-capacity (value, index)
arrays with validity masks.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3: 16 (dx, dy) offsets in clockwise order
# (the classic FAST-9/16 test set).
CIRCLE_OFFSETS = np.array(
    [
        (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
    ],
    dtype=np.int32,
)  # (dx, dy)

ARC_LENGTH = 9  # FAST-9: need 9 contiguous circle pixels all brighter/darker


def _shifted_stack(img: jnp.ndarray) -> jnp.ndarray:
    """[16, H, W] where slice i is the image shifted by circle offset i.

    Uses jnp.roll (cheap lane rotations on TPU); border pixels are invalidated
    by the caller's border mask so wraparound values never matter.
    """
    outs = []
    for dx, dy in CIRCLE_OFFSETS:
        outs.append(jnp.roll(img, shift=(-int(dy), -int(dx)), axis=(0, 1)))
    return jnp.stack(outs, axis=0)


def _circ_window_min9(x: jnp.ndarray) -> jnp.ndarray:
    """Sliding circular-window minimum, window 9, along axis 0 (length 16).

    Log-step composition: 4 roll+min passes instead of 8 sequential ones.
    out[i] = min(x[i..i+8 mod 16]).
    """
    w2 = jnp.minimum(x, jnp.roll(x, -1, axis=0))
    w4 = jnp.minimum(w2, jnp.roll(w2, -2, axis=0))
    w8 = jnp.minimum(w4, jnp.roll(w4, -4, axis=0))
    return jnp.minimum(w8, jnp.roll(x, -8, axis=0))


def fast_corner_score(img: jnp.ndarray) -> jnp.ndarray:
    """Threshold-free FAST-9 score map [H, W] (int16).

    score(p) = max over contiguous 9-arcs of min over the arc of the one-sided
    center difference — i.e. the LARGEST threshold t for which p is still a
    FAST-9 corner.  This is exactly OpenCV's nonmax-suppression score
    semantics (the reference consumes cv::FAST scores,
    ``src/ORBextractor.cc:769-829``), and one map serves every threshold:
    ``score > t``  <=>  "p is a corner at threshold t".
    """
    img16 = img.astype(jnp.int16)
    circle = _shifted_stack(img16)          # [16,H,W] i16
    diff = circle - img16[None]
    v_b = jnp.max(_circ_window_min9(diff), axis=0)    # brighter side
    v_d = jnp.max(_circ_window_min9(-diff), axis=0)   # darker side
    return jnp.maximum(v_b, v_d)


def fast_score_map(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Dense FAST-9 response map [H, W] float32 (0 where not a corner).

    Kept for API compatibility: thresholds the threshold-free
    :func:`fast_corner_score`."""
    score = fast_corner_score(img)
    return jnp.where(score > threshold, score, 0).astype(jnp.float32)


def nms3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-maximum suppression: zero out non-peak responses."""
    neigh = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(score >= neigh, score, 0.0)


def _border_mask(h: int, w: int, border: int, dtype=jnp.bool_) -> jnp.ndarray:
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    return (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)


def detect_level(
    img: jnp.ndarray,
    capacity: int,
    ini_threshold: float = 20.0,
    min_threshold: float = 7.0,
    cell_size: int = 32,
    border: int = 19,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Detect up to ``capacity`` FAST corners on one pyramid level.

    Returns (xy[capacity,2] float32, score[capacity], valid[capacity]).

    Spatial uniformity: the level is split into ``cell_size`` cells; each cell
    contributes its best corners first (round-robin by per-cell rank), which
    reproduces the quadtree's one-per-region-first behavior
    (``DistributeOctTree`` retains the best keypoint per leaf).  Threshold
    fallback follows the reference: cells with no ini_th corner use min_th
    detections (``ORBextractor.cc:769-829``).
    """
    h, w = img.shape
    # ONE threshold-free score map serves both thresholds (the reference's
    # hi->lo fallback, ORBextractor.cc:769-829): corner at t <=> score > t.
    raw = fast_corner_score(img).astype(jnp.float32)
    raw = jnp.where(raw > min_threshold, raw, 0.0)
    score = nms3(raw)
    bmask = _border_mask(h, w, border)
    score = jnp.where(bmask, score, 0.0)

    # Pad to cell multiples.
    ph = (-h) % cell_size
    pw = (-w) % cell_size
    score = jnp.pad(score, ((0, ph), (0, pw)))
    hp, wp = h + ph, w + pw
    ncy, ncx = hp // cell_size, wp // cell_size
    n_cells = ncy * ncx

    def to_cells(s):
        return (
            s.reshape(ncy, cell_size, ncx, cell_size)
            .transpose(0, 2, 1, 3)
            .reshape(n_cells, cell_size * cell_size)
        )

    cells_all = to_cells(score)
    cells_hi = jnp.where(cells_all > ini_threshold, cells_all, 0.0)
    has_hi = jnp.any(cells_hi > 0, axis=1, keepdims=True)
    cells = jnp.where(has_hi, cells_hi, cells_all)

    # Per-cell top-k (k bounded by capacity but kept small for top-k cost).
    k = max(1, min(cell_size * cell_size, -(-capacity // max(n_cells, 1)) * 4))
    vals, idx = jax.lax.top_k(cells, k)  # [n_cells, k]

    # Round-robin rank: cell-rank-major ordering == "each region's best first".
    rank = jnp.arange(k)[None, :] * jnp.float32(1.0)
    order_key = jnp.where(vals > 0, rank, jnp.inf)  # invalid -> last
    flat_vals = vals.reshape(-1)
    flat_key = order_key.reshape(-1)
    flat_cell = jnp.repeat(jnp.arange(n_cells), k)
    flat_inner = idx.reshape(-1)

    # Select `capacity` entries with smallest (rank, -score) — i.e. all cells'
    # best first, then second-best, etc.
    composite = flat_key * 1e6 - jnp.minimum(flat_vals, 1e5)
    take = jnp.argsort(composite)[:capacity]
    sel_vals = flat_vals[take]
    sel_cell = flat_cell[take]
    sel_inner = flat_inner[take]

    cy = sel_cell // ncx
    cx = sel_cell % ncx
    iy = sel_inner // cell_size
    ix = sel_inner % cell_size
    y = (cy * cell_size + iy).astype(jnp.float32)
    x = (cx * cell_size + ix).astype(jnp.float32)
    valid = sel_vals > 0
    xy = jnp.stack([x, y], axis=-1)
    return xy, sel_vals, valid
