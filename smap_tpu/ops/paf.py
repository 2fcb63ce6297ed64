"""PAF line-integral scoring: build the [num_limbs, K, K] pair-score table.

TPU-native (pure XLA, fixed-shape) equivalent of the reference CUDA kernel
(``extensions/gpu/bodyPartConnectorBase.cu:11-150`` in zju3dv/SMAP):

* For every (limb, peakA, peakB) triplet, sample up to 25 points along the
  A->B segment, dot the PAF vector field with the unit direction, and keep
  samples above ``inter_threshold``.
* The reference adapts the sample count to the segment length
  (5..25 = clamp(round(sqrt(5*max(|dx|,|dy|))))); we keep that *exactly* by
  always computing 25 samples and masking ``lm >= n_points`` — same values,
  static shapes.
* score = mean of passing samples if >=95% pass; else a small default if the
  peaks are nearly coincident (dist < sqrt(H*W)/150); else -1
  (bodyPartConnectorBase.cu:47-62, thresholds :172-174).

The whole table is one fused gather + VPU reduction; vmappable over batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from smap_tpu.ops.nms import Peaks


def paf_scores(pafs: jnp.ndarray, peaks: Peaks, limb_pairs: jnp.ndarray, *,
               inter_threshold: float = 0.05,
               inter_min_above: float = 0.95,
               default_threshold: float = 0.1,
               num_samples: int = 25) -> jnp.ndarray:
    """Compute PAF pair scores.

    Args:
      pafs: [2*L, H, W] PAF field (x-channel, y-channel per limb, already
        divided by 127 as in the reference test driver, test.py:112).
      peaks: Peaks with xy [J, K, 2], score [J, K], count [J].
      limb_pairs: [L, 2] int array of (src_joint, dst_joint).

    Returns:
      [L, K, K] float32 score table; invalid pairs hold -1.
    """
    L = limb_pairs.shape[0]
    K = peaks.xy.shape[1]
    _, h, w = pafs.shape
    close_threshold = (float(h) * float(w)) ** 0.5 / 150.0

    src_xy = peaks.xy[limb_pairs[:, 0]]        # [L, K, 2]
    dst_xy = peaks.xy[limb_pairs[:, 1]]        # [L, K, 2]
    n_src = peaks.count[limb_pairs[:, 0]]      # [L]
    n_dst = peaks.count[limb_pairs[:, 1]]

    a = src_xy[:, :, None, :]                  # [L, K, 1, 2]
    b = dst_xy[:, None, :, :]                  # [L, 1, K, 2]
    vec = b - a                                # [L, K, K, 2]
    norm = jnp.sqrt(jnp.sum(vec * vec, axis=-1))          # [L, K, K]
    vmax = jnp.maximum(jnp.abs(vec[..., 0]), jnp.abs(vec[..., 1]))
    n_pts = jnp.clip(jnp.floor(jnp.sqrt(5.0 * vmax) + 0.5), 5, num_samples)
    unit = vec / jnp.maximum(norm, 1e-12)[..., None]

    # Sample positions: x_lm = round(ax + lm * dx / n_pts), clamped above.
    lm = jnp.arange(num_samples, dtype=jnp.float32)       # [S]
    step = vec[..., None, :] / n_pts[..., None, None]     # [L, K, K, 1, 2]
    pos = a[..., None, :] + lm[None, None, None, :, None] * step
    # intRoundGPU(x) = int(x + 0.5); min-clamp to the last row/col
    # (bodyPartConnectorBase.cu:36-37).
    px = jnp.minimum(jnp.floor(pos[..., 0] + 0.5), w - 1).astype(jnp.int32)
    py = jnp.minimum(jnp.floor(pos[..., 1] + 0.5), h - 1).astype(jnp.int32)
    px = jnp.maximum(px, 0)
    py = jnp.maximum(py, 0)
    flat_idx = py * w + px                                 # [L, K, K, S]

    paf_x = pafs[0::2].reshape(L, h * w)                   # [L, HW]
    paf_y = pafs[1::2].reshape(L, h * w)
    take = jax.vmap(lambda m, i: jnp.take(m, i, axis=0))
    mx = take(paf_x, flat_idx.reshape(L, -1)).reshape(L, K, K, num_samples)
    my = take(paf_y, flat_idx.reshape(L, -1)).reshape(L, K, K, num_samples)

    sample_score = unit[..., 0:1] * mx + unit[..., 1:2] * my  # [L,K,K,S]
    active = lm[None, None, None, :] < n_pts[..., None]
    passing = (sample_score > inter_threshold) & active
    cnt = jnp.sum(passing, axis=-1).astype(jnp.float32)
    ssum = jnp.sum(jnp.where(passing, sample_score, 0.0), axis=-1)

    mean_score = ssum / jnp.maximum(cnt, 1.0)
    enough = cnt / n_pts > inter_min_above
    close = norm < close_threshold
    score = jnp.where(enough, mean_score,
                      jnp.where(close, default_threshold + 1e-6, -1.0))
    # Coincident peaks never connect (bodyPartConnectorBase.cu:23).
    score = jnp.where(norm > 1e-6, score, -1.0)

    # Invalid peak slots -> -1 (bodyPartConnectorBase.cu:134,148).
    ia = jnp.arange(K)
    valid = ((ia[None, :, None] < n_src[:, None, None]) &
             (ia[None, None, :] < n_dst[:, None, None]))
    return jnp.where(valid, score, -1.0).astype(jnp.float32)
