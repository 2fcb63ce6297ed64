"""End-to-end jitted post-processing: network maps -> 3D skeletons.

Single fused, batch-vmapped XLA pipeline replacing the reference's
per-image mix of CUDA kernels, CPU greedy loops and numpy
(``exps/stage3_root2/test.py:105-134`` in zju3dv/SMAP):

  normalize maps -> peak NMS -> PAF score table -> depth-aware association
  -> limb delta-Z readout -> kinematic chaining -> absolute root depth
  -> un-letterbox -> back-projection.

Everything is fixed-shape: results come back as [B, K, 15, 4] tables with a
per-image person count. The host only slices valid rows for serialization.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from smap_tpu.config import (NUM_JOINTS, PAF_VECTOR, PostProcessConfig,
                             ROOT_IDX, STRIDE)
from smap_tpu.ops.association import associate
from smap_tpu.ops.depth import (back_project_bodies, chain_depths,
                                read_limb_depths, root_depths)
from smap_tpu.ops.nms import Peaks, extract_peaks
from smap_tpu.ops.paf import paf_scores


class PoseResults(NamedTuple):
    """Fixed-capacity per-image results (batch leading axis when batched).

    bodies_2d: [K, J, 4] (x, y, chained rel-Z, score) at input resolution.
    bodies_3d: [K, J, 4] (X, Y, Z, score) camera space.
    root_depth: [K] absolute root depth per person.
    count: [] number of valid persons.
    overflow: [] bool — some joint channel had more peaks than the
      ``assoc_peaks`` capacity, so results may diverge from the reference's
      127-peak tables (extensions/association.cpp:20). Callers can re-run
      flagged images at full capacity (see SMAPInference).
    """

    bodies_2d: jnp.ndarray
    bodies_3d: jnp.ndarray
    root_depth: jnp.ndarray
    count: jnp.ndarray
    overflow: jnp.ndarray


class ScaleInfo(NamedTuple):
    """Per-image letterbox/camera metadata (all float32 scalars/arrays)."""

    scale: jnp.ndarray
    img_w: jnp.ndarray
    img_h: jnp.ndarray
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray


def postprocess_single(outputs_2d: jnp.ndarray, outputs_3d: jnp.ndarray,
                       outputs_rd: jnp.ndarray, scale: ScaleInfo,
                       cfg: PostProcessConfig = PostProcessConfig(),
                       *, net_w: float = 832.0, net_h: float = 512.0,
                       stride: int = STRIDE) -> PoseResults:
    """Post-process one image's network outputs (NHWC maps).

    Args:
      outputs_2d: [Ho, Wo, 43] summed finest 2D maps (raw network scale).
      outputs_3d: [Ho, Wo, 14] delta-Z maps.
      outputs_rd: [Ho, Wo, 1] root-depth map.
      scale: letterbox/camera metadata.
    """
    limb_pairs = jnp.asarray(PAF_VECTOR, jnp.int32)

    maps = jnp.moveaxis(outputs_2d.astype(jnp.float32), -1, 0)  # [43,Ho,Wo]
    # Normalization constants from the label encoding: heatmaps peak at 255,
    # PAF unit vectors scaled by 127 (reference: test.py:111-112).
    kpt = maps[:NUM_JOINTS] / 255.0
    paf = maps[NUM_JOINTS:] / 127.0
    rd_map = outputs_rd[..., 0].astype(jnp.float32)             # [Ho, Wo]
    paf_z = jnp.moveaxis(outputs_3d.astype(jnp.float32), -1, 0)  # [14,Ho,Wo]

    peaks = extract_peaks(kpt, max_peaks=cfg.max_peaks,
                          threshold=cfg.nms_threshold, offset=cfg.nms_offset)
    # Truncate candidates for the K^2-cost stages (see PostProcessConfig.
    # assoc_peaks); identical results while per-joint peak counts fit.
    # ``overflow`` flags images where truncation actually dropped peaks
    # (counts are already capped at max_peaks=127, the reference's own cap,
    # so overflow is False whenever the reference itself would truncate).
    kassoc = min(cfg.assoc_peaks, cfg.max_peaks)
    overflow = jnp.any(peaks.count > kassoc)
    if kassoc < cfg.max_peaks:
        peaks = Peaks(xy=peaks.xy[:, :kassoc],
                      score=peaks.score[:, :kassoc],
                      count=jnp.minimum(peaks.count, kassoc))
    table = paf_scores(paf, peaks, limb_pairs,
                       inter_threshold=cfg.inter_threshold,
                       inter_min_above=cfg.inter_min_above_threshold,
                       default_threshold=cfg.default_nms_threshold,
                       num_samples=cfg.num_line_samples,
                       impl=cfg.paf_impl, parts=cfg.paf_parts)
    bodies = associate(peaks, table, rd_map, root_idx=ROOT_IDX,
                       ds_scale=cfg.ds_scale, bone_factor=cfg.bone_factor,
                       impl=cfg.assoc_impl)

    # To input resolution (reference: test.py:117).
    bodies_2d = bodies.joints.at[..., :2].multiply(float(stride))

    depth_v = read_limb_depths(bodies_2d, paf_z, stride=stride,
                               num_samples=cfg.num_depth_samples,
                               root_idx=ROOT_IDX)
    rel_z = chain_depths(depth_v, bodies_2d[..., 3], root_idx=ROOT_IDX,
                         num_joints=NUM_JOINTS)
    person_ok = bodies_2d[:, ROOT_IDX, 3] > 0
    rel_z = jnp.where(person_ok[:, None], rel_z, 0.0)
    abs_root = root_depths(bodies_2d, rd_map, scale=scale.scale,
                           f_x=scale.fx, stride=stride, root_idx=ROOT_IDX)

    K = jnp.stack([
        jnp.stack([scale.fx, jnp.zeros_like(scale.fx), scale.cx]),
        jnp.stack([jnp.zeros_like(scale.fy), scale.fy, scale.cy]),
        jnp.stack([jnp.zeros_like(scale.fx), jnp.zeros_like(scale.fx),
                   jnp.ones_like(scale.fx)]),
    ])
    bodies_3d = back_project_bodies(
        bodies_2d, rel_z, abs_root, K, scale=scale.scale,
        net_w=net_w, net_h=net_h, img_w=scale.img_w, img_h=scale.img_h,
        root_idx=ROOT_IDX)

    # Reference stores the chained rel-Z in the 2D table's third column
    # (test_util.py:45-57 mutates pred_bodys in place).
    bodies_2d = bodies_2d.at[..., 2].set(rel_z)
    return PoseResults(bodies_2d=bodies_2d, bodies_3d=bodies_3d,
                       root_depth=abs_root, count=bodies.count,
                       overflow=overflow)


def postprocess_batch(outputs_2d, outputs_3d, outputs_rd, scale: ScaleInfo,
                      cfg: PostProcessConfig = PostProcessConfig(),
                      *, net_w: float = 832.0, net_h: float = 512.0,
                      stride: int = STRIDE) -> PoseResults:
    """vmap of :func:`postprocess_single` over the batch axis."""
    fn = functools.partial(postprocess_single, cfg=cfg, net_w=net_w,
                           net_h=net_h, stride=stride)
    return jax.vmap(fn)(outputs_2d, outputs_3d, outputs_rd, scale)


def flip_tta_merge(outputs_2d: jnp.ndarray, outputs_2d_flip: jnp.ndarray,
                   flip_order, paf_flip_channel,
                   num_joints: int = NUM_JOINTS) -> jnp.ndarray:
    """Merge horizontally-flipped 2D maps into the originals.

    Reference semantics (test.py:55-70): the flipped prediction is re-flipped
    along W, channel-permuted (keypoints by FLIP_ORDER, PAF channels by
    PAF_FLIP_CHANNEL), x-direction PAF channels negated, then *added*; only
    the PAF channels are halved afterwards (keypoint channels stay summed).

    Args:
      outputs_2d: [B, H, W, 43] upright prediction.
      outputs_2d_flip: [B, H, W, 43] prediction on the W-flipped image
        (not yet re-flipped).
    """
    flipped = outputs_2d_flip[:, :, ::-1, :]
    perm = list(flip_order) + [num_joints + c for c in paf_flip_channel]
    gathered = flipped[..., jnp.asarray(perm)]
    sign = jnp.ones((outputs_2d.shape[-1],), outputs_2d.dtype)
    for i in range(num_joints, outputs_2d.shape[-1]):
        if (i - num_joints) % 2 == 0:   # x-direction PAF channel
            sign = sign.at[i].set(-1.0)
    merged = outputs_2d + gathered * sign
    half = jnp.concatenate([
        jnp.ones((num_joints,), outputs_2d.dtype),
        jnp.full((outputs_2d.shape[-1] - num_joints,), 0.5, outputs_2d.dtype),
    ])
    return merged * half
