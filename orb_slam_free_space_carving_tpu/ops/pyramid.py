"""Image pyramid construction (jittable, fixed shapes).

Replaces ``ORBextractor::ComputePyramid`` (reference
``src/ORBextractor.cc:1107-1132``): 8 levels at scale 1.2 via bilinear resize.
On TPU the resize is an XLA gather/interp that fuses with the downstream FAST
score computation; all level shapes are static (computed host-side from config).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp


def level_shapes(height: int, width: int, n_levels: int, scale_factor: float):
    """Static per-level (H, W) — mirrors the reference's round(size/scale^l)."""
    shapes = []
    for l in range(n_levels):
        inv = 1.0 / (scale_factor ** l)
        shapes.append((int(round(height * inv)), int(round(width * inv))))
    return shapes


def _resize_bilinear(img: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    return jax.image.resize(img, shape, method="bilinear")


def gaussian_blur7(img: jnp.ndarray, sigma: float = 2.0) -> jnp.ndarray:
    """Separable 7x7 Gaussian (reference blurs each level before BRIEF,
    ``src/ORBextractor.cc:1084-1090``)."""
    r = 3
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    pad = jnp.pad(img, ((r, r), (r, r)), mode="edge")
    # Shift-and-add separable passes (static slices; cheaper on TPU than
    # vmapped 1D convolves, which lower to generalized convolutions).
    H, W = img.shape
    h = sum(k[i] * pad[:, i:i + W] for i in range(2 * r + 1))
    v = sum(k[i] * h[i:i + H, :] for i in range(2 * r + 1))
    return v


def build_pyramid(img_u8: jnp.ndarray, n_levels: int, scale_factor: float
                  ) -> List[jnp.ndarray]:
    """uint8 [H,W] -> list of float32 [Hl,Wl] levels (and blurred copies).

    Returns (levels, blurred) lists; level 0 is the input image as float32.
    """
    img = img_u8.astype(jnp.float32)
    shapes = level_shapes(img_u8.shape[0], img_u8.shape[1], n_levels, scale_factor)
    levels = [img]
    for l in range(1, n_levels):
        levels.append(_resize_bilinear(levels[-1], shapes[l]))
    blurred = [gaussian_blur7(lv) for lv in levels]
    return levels, blurred
