"""Peak extraction: 3x3 strict local-max NMS + raster-order top-K +
7x7 score-weighted sub-pixel refinement.

TPU-native (pure XLA) equivalent of the reference CUDA NMS
(``extensions/gpu/nmsBase.cu:11-135`` in zju3dv/SMAP):

* local-max mask   -> shifted-compare reductions (VPU), borders excluded
                      (nmsBase.cu:24,48-49);
* raster indexing  -> ``lax.top_k`` over a descending raster key replaces
                      thrust::exclusive_scan + compaction (nmsBase.cu:165-166):
                      the K largest keys are exactly the first K masked pixels
                      in raster order, preserving the reference's
                      first-``max_peaks`` truncation without any scatter
                      (TPU scatters serialize; top_k is a fused sort network);
* sub-pixel refine -> the per-peak 7x7 score-weighted centroid
                      (nmsBase.cu:93-127) is computed for *all* pixels at
                      once with three 7x7 box-filter convolutions, then
                      gathered at the peaks. This turns a divergent loop
                      into dense conv work XLA pipelines well.

Everything is static-shape and vmappable over both the joint axis and the
batch axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Peaks(NamedTuple):
    """Fixed-capacity peak table for one (batch of) heatmap channel(s).

    xy: [..., max_peaks, 2] sub-pixel refined coordinates (x, y).
    score: [..., max_peaks] raw heatmap value at the peak pixel.
    count: [...] number of valid peaks (<= max_peaks).
    """

    xy: jnp.ndarray
    score: jnp.ndarray
    count: jnp.ndarray


def _local_max_mask(hm: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Strict 3x3 local-max above threshold; border rows/cols excluded."""
    h, w = hm.shape[-2], hm.shape[-1]
    neg = jnp.asarray(-jnp.inf, hm.dtype)
    padded = jnp.pad(hm, [(0, 0)] * (hm.ndim - 2) + [(1, 1), (1, 1)],
                     constant_values=neg)
    mask = hm > threshold
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            shifted = jax.lax.dynamic_slice_in_dim(
                jax.lax.dynamic_slice_in_dim(padded, 1 + dy, h, axis=-2),
                1 + dx, w, axis=-1)
            mask &= hm > shifted
    border = jnp.zeros((h, w), dtype=bool).at[1:-1, 1:-1].set(True)
    return mask & border


def _box_filter_7x7(x: jnp.ndarray) -> jnp.ndarray:
    """Separable 7x7 sum filter with zero padding, layout [..., H, W]."""
    kernel = jnp.ones((7,), x.dtype)
    pad = [(0, 0)] * (x.ndim - 2) + [(3, 3), (0, 0)]
    xp = jnp.pad(x, pad)
    # Sum over a sliding window via cumulative-sum differences (O(HW)).
    def sliding_sum(a, axis):
        c = jnp.cumsum(a, axis=axis)
        size = a.shape[axis]
        out_len = size - 6
        hi = jax.lax.slice_in_dim(c, 6, size, axis=axis)
        lo = jax.lax.slice_in_dim(c, 0, out_len - 1, axis=axis)
        zero = jnp.zeros_like(jax.lax.slice_in_dim(c, 0, 1, axis=axis))
        lo = jnp.concatenate([zero, lo], axis=axis)
        return hi - lo

    y = sliding_sum(xp, axis=x.ndim - 2)
    pad_w = [(0, 0)] * (x.ndim - 2) + [(0, 0), (3, 3)]
    y = jnp.pad(y, pad_w)
    return sliding_sum(y, axis=x.ndim - 1)


def extract_peaks(heatmaps: jnp.ndarray, *, max_peaks: int = 127,
                  threshold: float = 0.2, offset: float = 0.5) -> Peaks:
    """Extract up to ``max_peaks`` refined peaks per channel.

    Args:
      heatmaps: [C, H, W] float heatmaps (already normalized).

    Returns:
      Peaks with xy [C, max_peaks, 2], score [C, max_peaks], count [C].
      Slots beyond ``count`` hold zeros.
    """
    c, h, w = heatmaps.shape
    hm = heatmaps.astype(jnp.float32)
    mask = _local_max_mask(hm, threshold)            # [C, H, W]

    # Sub-pixel refinement fields (computed densely, gathered at peaks).
    s_pos = jnp.where(hm > 0, hm, 0.0)
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    sum_s = _box_filter_7x7(s_pos)
    sum_sx = _box_filter_7x7(s_pos * xs)
    sum_sy = _box_filter_7x7(s_pos * ys)
    refined_x = sum_sx / sum_s + offset
    refined_y = sum_sy / sum_s + offset

    # Raster-order top-K selection. Masked pixels get the key HW - raster
    # (strictly positive, strictly decreasing along the raster); unmasked
    # pixels get 0. top_k therefore returns the first K masked pixels in
    # raster order — nmsBase.cu:165-166's scan+compact with no scatter.
    flat_mask = mask.reshape(c, h * w)
    raster = jnp.arange(h * w, dtype=jnp.int32)
    key = jnp.where(flat_mask, h * w - raster, 0)
    _, peak_idx = jax.lax.top_k(key, max_peaks)       # [C, max_peaks]
    count = jnp.minimum(jnp.sum(flat_mask, axis=-1), max_peaks)
    valid = jnp.arange(max_peaks)[None, :] < count[:, None]

    gather = jax.vmap(lambda vals, i: vals[i])
    px = jnp.where(valid, gather(refined_x.reshape(c, h * w), peak_idx), 0.0)
    py = jnp.where(valid, gather(refined_y.reshape(c, h * w), peak_idx), 0.0)
    ps = jnp.where(valid, gather(hm.reshape(c, h * w), peak_idx), 0.0)
    return Peaks(xy=jnp.stack([px, py], axis=-1), score=ps, count=count)
