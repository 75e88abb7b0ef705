"""Stereo depth: batched left-right descriptor matching + SAD subpixel refine.

TPU re-design of ``Frame::ComputeStereoMatches`` (reference
``src/Frame.cc:466-641``) and ``Frame::ComputeStereoFromRGBD`` (``:643-664``).
The reference builds a per-row candidate table and loops left keypoints with
scalar Hamming + sliding SAD; here the whole frame is matched at once:

- candidate gating (same row band, disparity range, octave agreement) is a
  dense [N,N] mask over one Hamming-distance matmul (MXU);
- subpixel refinement is a batched gather of 11-pixel-high patch strips from a
  stacked padded pyramid + 11 SAD offsets evaluated as array ops, with the
  same parabola fit and the same median-SAD outlier rejection (``:612-640``).

Outputs per left feature: ``u_right`` (refined right x in level-0 undistorted
coords, -1 if unmatched) and ``depth`` (= bf / disparity, -1 if unmatched).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orb_slam_free_space_carving_tpu.ops import matching

SAD_W = 5        # half window of the SAD patch (11x11), Frame.cc:540
SAD_L = 5        # +/- slide range, Frame.cc:541


def stack_pyramid(levels) -> jnp.ndarray:
    """Stack pyramid levels into [L, H0, W0] (top-left anchored, zero pad)."""
    h0, w0 = levels[0].shape
    out = []
    for im in levels:
        h, w = im.shape
        out.append(jnp.pad(im, ((0, h0 - h), (0, w0 - w))))
    return jnp.stack(out, axis=0)


def _gather_strip(pyr_stack, level, cx, cy, half_h: int, half_w: int):
    """Gather [N, 2*half_h+1, 2*half_w+1] patches at integer centers per level."""
    L, H, W = pyr_stack.shape
    dy = jnp.arange(-half_h, half_h + 1)
    dx = jnp.arange(-half_w, half_w + 1)
    ys = jnp.clip(cy[:, None] + dy[None, :], 0, H - 1)          # [N, ph]
    xs = jnp.clip(cx[:, None] + dx[None, :], 0, W - 1)          # [N, pw]
    lv = jnp.clip(level, 0, L - 1)
    return pyr_stack[lv[:, None, None], ys[:, :, None], xs[:, None, :]]


def stereo_match(
    feat_l, feat_r,
    pyr_l: jnp.ndarray, pyr_r: jnp.ndarray,
    bf: float, intr, scale_factor: float, level_sigma: jnp.ndarray,
    th_high: float = 100.0,
):
    """Per-left-feature right x-coordinate and depth.

    ``pyr_l/pyr_r``: [L,H,W] stacked (padded) pyramids in float32.
    ``level_sigma``: [L] per-level sigma (= scale factor^level).

    Returns (u_right[N], depth[N]) with -1 where unmatched — the contract of
    ``Frame::ComputeStereoMatches`` (mvuRight / mvDepth, Frame.cc:469-471).
    """
    N = feat_l.capacity
    fx = intr[0]
    min_z = bf / fx                                  # baseline (Frame.cc:533)
    min_d = 0.0
    max_d = bf / min_z                               # = fx (Frame.cc:534-535)

    # --- candidate mask: row band + disparity range + octave agreement
    vl = feat_l.xy[:, 1]
    vr = feat_r.xy[:, 1]
    ul = feat_l.xy[:, 0]
    ur = feat_r.xy[:, 0]
    r_band = 2.0 * level_sigma[jnp.clip(feat_r.octave, 0, level_sigma.shape[0] - 1)]
    row_ok = jnp.abs(vl[:, None] - vr[None, :]) <= r_band[None, :]
    disp = ul[:, None] - ur[None, :]
    disp_ok = (disp >= min_d) & (disp <= max_d)
    oct_ok = matching.octave_mask(feat_l.octave, feat_r.octave, -1, 1)
    mask = row_ok & disp_ok & oct_ok & feat_l.valid[:, None] & feat_r.valid[None, :]

    dist = matching.hamming_matrix(feat_l.desc, feat_r.desc)
    idx, best = matching.masked_match(dist, mask, max_dist=th_high)
    matched = idx >= 0
    sel = jnp.clip(idx, 0, N - 1)

    # --- SAD subpixel refine at the left feature's octave (Frame.cc:526-607)
    lv = jnp.clip(feat_l.octave, 0, level_sigma.shape[0] - 1)
    inv_scale = 1.0 / level_sigma[lv]                # 1/scale^level
    xl = jnp.round(ul * inv_scale).astype(jnp.int32)
    yl = jnp.round(vl * inv_scale).astype(jnp.int32)
    ur0 = ur[sel]
    xr0 = jnp.round(ur0 * inv_scale).astype(jnp.int32)

    patch_l = _gather_strip(pyr_l, lv, xl, yl, SAD_W, SAD_W)          # [N,11,11]
    strip_r = _gather_strip(pyr_r, lv, xr0, yl, SAD_W, SAD_W + SAD_L)  # [N,11,21]
    # Center-intensity normalization (Frame.cc:560-571).
    patch_l = patch_l - patch_l[:, SAD_W, SAD_W][:, None, None]
    sads = []
    for o in range(2 * SAD_L + 1):
        win = strip_r[:, :, o:o + 2 * SAD_W + 1]
        win = win - win[:, SAD_W, SAD_W][:, None, None]
        sads.append(jnp.sum(jnp.abs(patch_l - win), axis=(1, 2)))
    sad = jnp.stack(sads, axis=-1)                    # [N, 11], offset -5..+5
    best_o = jnp.argmin(sad, axis=-1)
    interior = (best_o > 0) & (best_o < 2 * SAD_L)    # Frame.cc:585-586
    o_c = jnp.clip(best_o, 1, 2 * SAD_L - 1)
    rows = jnp.arange(N)
    d0 = sad[rows, o_c - 1]
    d1 = sad[rows, o_c]
    d2 = sad[rows, o_c + 1]
    denom = jnp.maximum(d0 + d2 - 2.0 * d1, 1e-6)
    delta = (d0 - d2) / (2.0 * denom)                 # parabola (Frame.cc:591)
    sub_ok = interior & (jnp.abs(delta) <= 1.0)

    scale = level_sigma[lv]
    u_right = scale * (xr0.astype(jnp.float32) + (o_c - SAD_L).astype(jnp.float32)
                       + delta)
    disparity = ul - u_right
    disp_valid = (disparity > min_d) & (disparity < max_d)
    # Reference snaps disparity<=0 to epsilon; we just reject (cleaner).
    ok = matched & sub_ok & disp_valid

    best_sad = d1
    # Median-SAD outlier rejection (Frame.cc:612-640): th = 1.5 * 1.4 * median.
    med = jnp.nanmedian(jnp.where(ok, best_sad, jnp.nan))
    med = jnp.where(jnp.isnan(med), jnp.inf, med)
    ok = ok & (best_sad < 1.5 * 1.4 * med)

    depth = jnp.where(ok, bf / jnp.maximum(disparity, 1e-6), -1.0)
    u_right = jnp.where(ok, u_right, -1.0)
    return u_right, depth


def depth_from_rgbd(feat, depth_img: jnp.ndarray, depth_factor: float,
                    bf: float):
    """RGB-D virtual right coordinate (``Frame::ComputeStereoFromRGBD``
    ``Frame.cc:643-664``): look up the depth map at each (raw) keypoint and
    synthesize u_right = u_undistorted - bf / depth.

    ``depth_img``: [H,W] raw depth (uint16 or float); scaled by 1/depth_factor.
    """
    H, W = depth_img.shape
    xi = jnp.clip(jnp.round(feat.xy[:, 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(feat.xy[:, 1]).astype(jnp.int32), 0, H - 1)
    d = depth_img[yi, xi].astype(jnp.float32)
    if depth_factor not in (0.0, 1.0):
        d = d / depth_factor
    ok = (d > 0) & feat.valid
    u_right = jnp.where(ok, feat.uv_und[:, 0] - bf / jnp.maximum(d, 1e-6), -1.0)
    depth = jnp.where(ok, d, -1.0)
    return u_right, depth
