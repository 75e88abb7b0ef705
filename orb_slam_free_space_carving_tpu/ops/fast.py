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


def fast_score_map(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Dense FAST-9 response map [H, W] (0 where not a corner).

    Score = max over qualifying contiguous 9-arcs of the summed absolute
    difference beyond threshold — a monotone stand-in for OpenCV's
    max-threshold score, adequate for NMS/top-k ordering.
    """
    circle = _shifted_stack(img)  # [16,H,W]
    diff = circle - img[None]
    brighter = diff > threshold
    darker = diff < -threshold

    def arc_all(mask):
        # arc9[i] = AND of mask[i..i+8 (mod 16)]  -> [16,H,W]
        acc = mask
        rolled = mask
        for _ in range(ARC_LENGTH - 1):
            rolled = jnp.roll(rolled, shift=-1, axis=0)
            acc = acc & rolled
        return acc

    arc_b = arc_all(brighter)
    arc_d = arc_all(darker)

    excess = jnp.abs(diff) - threshold

    def arc_sum(mask_arc, excess_map):
        # For each start i, sum of excess over the 9-arc; keep only valid arcs.
        acc = excess_map
        rolled = excess_map
        for _ in range(ARC_LENGTH - 1):
            rolled = jnp.roll(rolled, shift=-1, axis=0)
            acc = acc + rolled
        return jnp.where(mask_arc, acc, 0.0)

    score_b = jnp.max(arc_sum(arc_b, jnp.where(brighter, excess, 0.0)), axis=0)
    score_d = jnp.max(arc_sum(arc_d, jnp.where(darker, excess, 0.0)), axis=0)
    return jnp.maximum(score_b, score_d)


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
    score_hi = nms3(fast_score_map(img, ini_threshold))
    score_lo = nms3(fast_score_map(img, min_threshold))
    bmask = _border_mask(h, w, border)
    score_hi = jnp.where(bmask, score_hi, 0.0)
    score_lo = jnp.where(bmask, score_lo, 0.0)

    # Pad to cell multiples.
    ph = (-h) % cell_size
    pw = (-w) % cell_size
    score_hi = jnp.pad(score_hi, ((0, ph), (0, pw)))
    score_lo = jnp.pad(score_lo, ((0, ph), (0, pw)))
    hp, wp = h + ph, w + pw
    ncy, ncx = hp // cell_size, wp // cell_size
    n_cells = ncy * ncx

    def to_cells(s):
        return (
            s.reshape(ncy, cell_size, ncx, cell_size)
            .transpose(0, 2, 1, 3)
            .reshape(n_cells, cell_size * cell_size)
        )

    cells_hi = to_cells(score_hi)
    cells_lo = to_cells(score_lo)
    has_hi = jnp.any(cells_hi > 0, axis=1, keepdims=True)
    cells = jnp.where(has_hi, cells_hi, cells_lo)

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
