"""On-device label synthesis: Gaussian heatmap pyramids, 3-channel PAF
(delta-Z) fields and sparse root-depth targets.

TPU-first re-design of the reference's per-sample cv2/numpy label loops
(``dataset/representation.py:5-113`` in zju3dv/SMAP): instead of rendering
labels on (one-core) host workers, the whole synthesis is a jitted function
running on the accelerator inside the train step — Gaussian blur becomes a
separable depthwise convolution, PAF bands become dense vectorized masks
over the output grid, and per-person accumulation is a sum/count reduction.
Numerics match the reference bit-for-bit up to conv reassociation:

* heatmaps (representation.py:5-21): delta at (int(y/s), int(x/s)) ->
  GaussianBlur(k, sigma=0.3*((k-1)*0.5-1)+0.8, REFLECT_101 border) ->
  peak normalized to 255;
* PAFs (representation.py:36-113): per limb, the band of points within
  ``thre`` of the segment (bounding-box restricted, integer-cast joint
  coords) carries [ux*127, uy*127, delta-Z], averaged where persons overlap;
* root depth (representation.py:23-34): rows (y/s, x/s, Z/(f*scale)),
  depth-descending sort, ``max_people`` capacity.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smap_tpu.config import NUM_JOINTS, NUM_LIMBS, PAF_VECTOR, ROOT_IDX


# cv2.getGaussianKernel(k, 0) uses fixed binomial kernels for small sizes
# (OpenCV small_gaussian_tab); larger sizes use the sigma-from-size formula.
_SMALL_GAUSSIAN = {
    1: np.array([1.0], np.float32),
    3: np.array([0.25, 0.5, 0.25], np.float32),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625], np.float32),
    7: np.array([4, 14, 28, 36, 28, 14, 4], np.float32) / 128.0,
    9: np.array([4, 13, 30, 51, 60, 51, 30, 13, 4], np.float32) / 256.0,
}


def _gaussian_kernel_1d(ksize: int) -> np.ndarray:
    """cv2.getGaussianKernel(ksize, 0) parity (see tests/test_labels.py)."""
    if ksize in _SMALL_GAUSSIAN:
        return _SMALL_GAUSSIAN[ksize]
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    xs = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    k = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def _blur_reflect(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Separable blur with REFLECT_101 border, x: [C, H, W]."""
    k = kernel.shape[0]
    r = k // 2
    kx = jnp.asarray(kernel)
    xp = jnp.pad(x, ((0, 0), (r, r), (0, 0)), mode="reflect")
    x = sum(kx[i] * jax.lax.slice_in_dim(xp, i, i + x.shape[1], axis=1)
            for i in range(k))
    xp = jnp.pad(x, ((0, 0), (0, 0), (r, r)), mode="reflect")
    return sum(kx[i] * jax.lax.slice_in_dim(xp, i, i + x.shape[2], axis=2)
               for i in range(k))


def synthesize_heatmaps(joints: jnp.ndarray, vis: jnp.ndarray,
                        out_shape: Tuple[int, int], stride: int,
                        kernels: Sequence[int]) -> jnp.ndarray:
    """Heatmap pyramid for one sample.

    Args:
      joints: [P, J, 2] (x, y) at input resolution (post-augmentation).
      vis: [P, J] visibility (>= 1 marks labeled).
      kernels: one odd Gaussian size per pyramid level.

    Returns:
      [num_levels, H, W, J] heatmaps, peak-normalized to 255.
    """
    h, w = out_shape
    xi = (joints[..., 0] / stride).astype(jnp.int32)     # trunc toward zero
    yi = (joints[..., 1] / stride).astype(jnp.int32)
    valid = vis >= 1
    xi = jnp.where(valid, xi, w)                          # drop invalid
    yi = jnp.where(valid, yi, h)
    delta = jnp.zeros((NUM_JOINTS, h, w), jnp.float32)
    jj = jnp.broadcast_to(jnp.arange(NUM_JOINTS)[None, :], xi.shape)
    delta = delta.at[jj.ravel(), yi.ravel(), xi.ravel()].set(1.0, mode="drop")

    levels = []
    for ksize in kernels:
        hm = _blur_reflect(delta, _gaussian_kernel_1d(ksize))
        peak = jnp.max(hm, axis=(1, 2), keepdims=True)
        hm = jnp.where(peak > 1e-8, hm * 255.0 / peak, hm)
        levels.append(jnp.moveaxis(hm, 0, -1))            # [H, W, J]
    return jnp.stack(levels)


def synthesize_pafs(joints_xyz: jnp.ndarray, vis: jnp.ndarray,
                    out_shape: Tuple[int, int], stride: int,
                    thre: float, min_vis: int) -> jnp.ndarray:
    """3-channel-per-limb PAF field for one pyramid level of one sample.

    Args:
      joints_xyz: [P, J, 3] integer-cast (x, y, Z) at input resolution
        (the reference casts to int before rasterizing,
        representation.py:46-47).
      vis: [P, J] visibility.
      thre: band half-width at output resolution.
      min_vis: 1, or 2 for wide bands on MDS-labeled data
        (representation.py:41-44).

    Returns:
      [H, W, 3*L]; x/y channels scaled by 127.
    """
    h, w = out_shape
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]

    pairs = np.asarray(PAF_VECTOR)
    a = joints_xyz[:, pairs[:, 0]]                         # [P, L, 3]
    b = joints_xyz[:, pairs[:, 1]]
    vis_ok = ((vis[:, pairs[:, 0]] >= min_vis) &
              (vis[:, pairs[:, 1]] >= min_vis))            # [P, L]

    ax, ay = a[..., 0] / stride, a[..., 1] / stride        # [P, L]
    bx, by = b[..., 0] / stride, b[..., 1] / stride
    dz = b[..., 2] - a[..., 2]
    vx, vy = bx - ax, by - ay
    norm = jnp.sqrt(vx * vx + vy * vy)
    limb_ok = vis_ok & (norm >= 1.0)
    ux = jnp.where(limb_ok, vx / jnp.maximum(norm, 1e-9), 0.0)
    uy = jnp.where(limb_ok, vy / jnp.maximum(norm, 1e-9), 0.0)

    # Bounding box (representation.py:80-83): round() is banker's rounding.
    min_x = jnp.maximum(jnp.round(jnp.minimum(ax, bx) - thre), 0)
    max_x = jnp.minimum(jnp.round(jnp.maximum(ax, bx) + thre), w)
    min_y = jnp.maximum(jnp.round(jnp.minimum(ay, by) - thre), 0)
    max_y = jnp.minimum(jnp.round(jnp.maximum(ay, by) + thre), h)

    def one_limb(ax, ay, ux, uy, dz, min_x, max_x, min_y, max_y, ok):
        # [P, H, W] band mask for every person.
        bax = xs[None] - ax[:, None, None]
        bay = ys[None] - ay[:, None, None]
        width = jnp.abs(bax * uy[:, None, None] - bay * ux[:, None, None])
        in_box = ((xs[None] >= min_x[:, None, None]) &
                  (xs[None] < max_x[:, None, None]) &
                  (ys[None] >= min_y[:, None, None]) &
                  (ys[None] < max_y[:, None, None]))
        band = (width < thre) & in_box & ok[:, None, None]
        bandf = band.astype(jnp.float32)
        count = jnp.sum(bandf, axis=0)                     # [H, W]
        sum_x = jnp.sum(bandf * ux[:, None, None], axis=0)
        sum_y = jnp.sum(bandf * uy[:, None, None], axis=0)
        sum_z = jnp.sum(bandf * dz[:, None, None], axis=0)
        denom = jnp.maximum(count, 1.0)
        return jnp.stack([sum_x / denom, sum_y / denom, sum_z / denom])

    per_limb = jax.vmap(one_limb, in_axes=(1,) * 10, out_axes=0)(
        ax, ay, ux, uy, dz, min_x, max_x, min_y, max_y, limb_ok)  # [L,3,H,W]
    per_limb = per_limb.at[:, :2].multiply(127.0)
    return jnp.moveaxis(per_limb.reshape(3 * NUM_LIMBS, h, w), 0, -1)


def synthesize_rdepth(bodys: jnp.ndarray, scale: jnp.ndarray, stride: int,
                      max_people: int) -> jnp.ndarray:
    """Sparse root-depth targets (representation.py:23-34).

    Args:
      bodys: [P, J, >=8] unified rows [x, y, Z, v, X, Y, Z, fx, ...]
        (P <= max_people).
      scale: scalar resize scale.

    Returns:
      [max_people, 3] rows (y/stride, x/stride, Z/(f*scale)), sorted by
      descending depth; padding rows are zero.
    """
    P = bodys.shape[0]
    root = bodys[:, ROOT_IDX]
    ok = root[:, 3] >= 1
    rows = jnp.stack([
        jnp.where(ok, root[:, 1] / stride, 0.0),
        jnp.where(ok, root[:, 0] / stride, 0.0),
        jnp.where(ok, root[:, 2] / root[:, 7] / scale, 0.0),
    ], axis=-1)
    if P < max_people:
        rows = jnp.pad(rows, ((0, max_people - P), (0, 0)))
    else:
        rows = rows[:max_people]
    order = jnp.argsort(-rows[:, 2], stable=True)
    return rows[order]


def synthesize_labels(bodys: jnp.ndarray, scale: jnp.ndarray,
                      out_shape: Tuple[int, int], stride: int,
                      kernels: Sequence[int], paf_thre: float,
                      with_mds: bool, max_people: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full label stack for one sample.

    Args:
      bodys: [P, J, 11] unified annotation rows (post-augmentation, invalid
        joints carry v=0).
      paf_thre: base line width (config PAF.LINE_WIDTH_THRE).

    Returns:
      labels [num_levels, H, W, 57] and rdepth [max_people, 3].
    """
    joints = bodys[..., :2]
    vis = bodys[..., 3]
    heatmaps = synthesize_heatmaps(joints, vis, out_shape, stride, kernels)
    joints_int = jnp.trunc(bodys[..., :3]).astype(jnp.float32)
    pafs = []
    for i in range(len(kernels)):
        # Band width per level: max(1, 3-i) * thre (base_dataset.py:185).
        thre_i = max(1, 3 - i) * paf_thre
        min_vis = 2 if (thre_i > 1 and with_mds) else 1
        pafs.append(synthesize_pafs(joints_int, vis, out_shape, stride,
                                    float(thre_i), min_vis))
    labels = jnp.concatenate([heatmaps, jnp.stack(pafs)], axis=-1)
    rdepth = synthesize_rdepth(bodys, scale, stride, max_people)
    return labels, rdepth
