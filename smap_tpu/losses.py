"""Training losses: masked per-channel L2 with OHKM, sparse root-depth L1,
and the full multi-stage/multi-scale SMAP objective.

Functional, fully-vectorized equivalents of the reference's loss modules
(``lib/utils/loss_h.py:10-62`` in zju3dv/SMAP) and the loss assembly in
``SMAP._calculate_loss`` (``model/smap.py:355-401``):

* ``joints_l2_loss`` — per-channel spatial MSE, masked by per-channel
  validity, optional online hard keypoint mining (top-k channels; separate
  top-k for keypoint and 2x top-k for PAF channels).
* ``depth_loss`` — L1 on the root-depth map at sparse GT root pixels; the
  reference's per-sample python loop (loss_h.py:19-23) becomes one gather.
* ``smap_loss`` — 3 stages x 4 scales x {2D, delta-Z, root-depth} weighted
  sum with coarse-to-fine label shifting on the last stage.

All channel layouts are NHWC ([B, H, W, C]); labels are [B, 5, H, W, 57].
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from smap_tpu.config import NUM_JOINTS, NUM_LIMBS, TrainConfig


def joints_l2_loss(output: jnp.ndarray, valid: jnp.ndarray,
                   label: jnp.ndarray, *, ohkm: bool = False, topk: int = 8,
                   paf_num: int = 0, thres: float = 0.0) -> jnp.ndarray:
    """Masked per-channel MSE (reference: loss_h.py:31-62).

    Args:
      output / label: [B, H, W, C].
      valid: [B, C] per-channel validity weights.
    """
    per_chan = jnp.mean((output - label) ** 2, axis=(1, 2))    # [B, C]
    weight = (valid > thres).astype(per_chan.dtype)
    per_chan = per_chan * weight
    if not ohkm:
        return jnp.mean(per_chan)
    if paf_num == 0:
        top = jax.lax.top_k(per_chan, topk)[0]
        return jnp.mean(top)
    kpt_num = per_chan.shape[1] - paf_num * 2
    kpt_top = jax.lax.top_k(per_chan[:, :kpt_num], topk)[0]
    paf_top = jax.lax.top_k(per_chan[:, kpt_num:], topk * 2)[0]
    return jnp.mean(kpt_top) + jnp.mean(paf_top)


def depth_loss(output: jnp.ndarray, rdepth: jnp.ndarray) -> jnp.ndarray:
    """Sparse L1 root-depth loss (reference: loss_h.py:10-28).

    Args:
      output: [B, H, W, 1] root-depth map.
      rdepth: [B, P, 3] rows of (y/stride, x/stride, normalized Z); Z <= 0
        marks padding.
    """
    b, h, w, _ = output.shape
    ys = jnp.clip(rdepth[..., 0].astype(jnp.int32), 0, h - 1)
    xs = jnp.clip(rdepth[..., 1].astype(jnp.int32), 0, w - 1)
    z = rdepth[..., 2]
    valid = z > 0
    batch_idx = jnp.arange(b)[:, None]
    pred = output[batch_idx, ys, xs, 0]                        # [B, P]
    err = jnp.abs(pred - z) * valid
    count = jnp.sum(valid)
    return jnp.where(count > 0, jnp.sum(err) / jnp.maximum(count, 1), 0.0)


def smap_loss(outputs: Dict[str, List[List[jnp.ndarray]]], valids: jnp.ndarray,
              labels: jnp.ndarray, rdepth: jnp.ndarray,
              cfg: TrainConfig = TrainConfig()) -> Dict[str, jnp.ndarray]:
    """Full training objective (reference: model/smap.py:355-401).

    Args:
      outputs: SMAP.__call__ dict; per-stage lists of 4 NHWC maps each.
      valids: [B, 57] channel validity (43 2D + 14 delta-Z).
      labels: [B, 5, H, W, 57] label pyramids (coarse blur -> fine blur).
      rdepth: [B, P, 3] sparse root-depth targets.
    """
    kpt_paf = NUM_JOINTS + 2 * NUM_LIMBS                       # 43
    paf_index = [i for i in range(3 * NUM_LIMBS) if i % 3 != 2]
    z_index = [i for i in range(3 * NUM_LIMBS) if i % 3 == 2]
    stage_num = len(outputs["heatmap_2d"])

    total = jnp.float32(0.0)
    loss_2d = jnp.float32(0.0)
    loss_bone = jnp.float32(0.0)
    loss_root = jnp.float32(0.0)
    for i in range(stage_num):
        for j in range(4):
            ind = j
            if i == stage_num - 1 and cfg.coarse_to_fine:
                ind += 1
            lbl = labels[:, ind]                               # [B, H, W, 57]
            kpt_labels = lbl[..., :NUM_JOINTS]
            paf_labels = lbl[..., NUM_JOINTS:]
            labels_2d = jnp.concatenate(
                [kpt_labels, paf_labels[..., paf_index]], axis=-1)
            labels_3d = paf_labels[..., z_index]

            use_ohkm = j == 3 and cfg.ohkm
            l2d = joints_l2_loss(outputs["heatmap_2d"][i][j],
                                 valids[:, :kpt_paf], labels_2d,
                                 ohkm=use_ohkm, topk=cfg.topk,
                                 paf_num=NUM_LIMBS if use_ohkm else 0)
            l3d = joints_l2_loss(outputs["det_d"][i][j],
                                 valids[:, kpt_paf:], labels_3d,
                                 ohkm=use_ohkm, topk=cfg.topk, paf_num=0)
            ld = depth_loss(outputs["root_d"][i][j], rdepth)

            if j == 3:
                loss_2d = loss_2d + l2d
                loss_bone = loss_bone + l3d
                loss_root = loss_root + ld
            stage_loss = 0.1 * l2d + 5.0 * l3d + 10.0 * ld
            if j < 3:
                stage_loss = stage_loss / 4.0
            total = total + stage_loss
    return {"total_loss": total, "loss_2d": loss_2d,
            "loss_bone": loss_bone, "loss_root": loss_root}
