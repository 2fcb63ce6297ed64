"""Host-side geometric augmentation: rotate, fit-crop/pad, flip.

Numpy/cv2 equivalents of the reference's per-sample augmentation
(``dataset/ImageAugmentation.py:54-176`` in zju3dv/SMAP). Only the image
warp itself runs on host; everything downstream (label synthesis) is
on-device (see smap_tpu.data.labels). Randomness is explicit: every op
takes a ``numpy.random.RandomState`` so the pipeline is reproducible and
shardable by seed.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from smap_tpu.config import FLIP_ORDER, TrainConfig


def rotate_augment(img: np.ndarray, bodys: np.ndarray, rng,
                   max_degree: float) -> Tuple[np.ndarray, np.ndarray]:
    """Random rotation with expanded canvas (ImageAugmentation.py:129-170)."""
    import cv2

    degree = (rng.random_sample() - 0.5) * 2 * max_degree
    h, w = img.shape[:2]
    cx, cy = w // 2, h // 2
    M = cv2.getRotationMatrix2D((cx, cy), -degree, 1.0)
    cos, sin = abs(M[0, 0]), abs(M[0, 1])
    nw = int(h * sin + w * cos)
    nh = int(h * cos + w * sin)
    M[0, 2] += nw / 2 - cx
    M[1, 2] += nh / 2 - cy
    out = cv2.warpAffine(img, M, (nw, nh), flags=cv2.INTER_CUBIC,
                         borderMode=cv2.BORDER_CONSTANT,
                         borderValue=(128, 128, 128))
    bodys = bodys.copy()
    if len(bodys):
        pts = np.concatenate([bodys[..., :2],
                              np.ones((*bodys.shape[:2], 1))], axis=-1)
        bodys[..., :2] = np.einsum("ij,pkj->pki", M, pts)
    return out, bodys


def croppad_augment(img: np.ndarray, bodys: np.ndarray, center: np.ndarray,
                    rng, cfg: TrainConfig, crop_hw: Tuple[int, int],
                    scale_aug: bool, jitter_max: float
                    ) -> Tuple[np.ndarray, np.ndarray, float]:
    """Fit-scale (x random factor), center jitter, 128-gray pad + crop
    (ImageAugmentation.py:54-107). Returns (img, bodys, scale).

    The random scale multiplier is applied only when ``scale_aug`` (the
    reference passes with_augmentation=False for non-COCO samples,
    base_dataset.py:141-144) while the center jitter depends only on
    ``jitter_max`` (zeroed globally when augmentation is off,
    base_dataset.py:139)."""
    import cv2

    dice_x = rng.random_sample()
    dice_y = rng.random_sample()
    scale_random = rng.random_sample()
    crop_y, crop_x = crop_hw
    scale = min(crop_x / float(img.shape[1]), crop_y / float(img.shape[0]))
    if scale_aug:
        scale *= ((cfg.scale_max - cfg.scale_min) * scale_random
                  + cfg.scale_min)
    img = cv2.resize(img, (0, 0), fx=scale, fy=scale)
    bodys = bodys.copy()
    if len(bodys):
        bodys[..., :2] *= scale

    x_offset = int((dice_x - 0.5) * 2 * jitter_max)
    y_offset = int((dice_y - 0.5) * 2 * jitter_max)
    ctr = (center * scale + np.array([x_offset, y_offset])).astype(int)

    pad_v = np.full((crop_y, img.shape[1], 3), 128, np.uint8)
    img = np.concatenate((pad_v, img, pad_v), axis=0)
    pad_h = np.full((img.shape[0], crop_x, 3), 128, np.uint8)
    img = np.concatenate((pad_h, img, pad_h), axis=1)
    img = img[int(ctr[1] + crop_y / 2):int(ctr[1] + crop_y / 2 + crop_y),
              int(ctr[0] + crop_x / 2):int(ctr[0] + crop_x / 2 + crop_x), :]

    offset = np.array([crop_x / 2 - ctr[0], crop_y / 2 - ctr[1]], np.int64)
    if len(bodys):
        bodys[..., :2] += offset
        out_of_crop = ((bodys[..., 0] >= crop_x) | (bodys[..., 0] < 0) |
                       (bodys[..., 1] >= crop_y) | (bodys[..., 1] < 0))
        bodys[..., 3] = np.where(out_of_crop, 0, bodys[..., 3])
    return img, bodys, scale


def flip_augment(img: np.ndarray, bodys: np.ndarray, rng,
                 flip_prob: float) -> Tuple[np.ndarray, np.ndarray]:
    """Random horizontal mirror + joint reorder (ImageAugmentation.py:110-126)."""
    import cv2

    if rng.random_sample() > flip_prob:
        return img, bodys
    img = cv2.flip(img, 1)
    bodys = bodys.copy()
    if len(bodys):
        bodys[..., 0] = img.shape[1] - 1 - bodys[..., 0]
        bodys = bodys[:, list(FLIP_ORDER), :]
    return img, bodys


def mark_out_of_crop(bodys: np.ndarray, crop_hw: Tuple[int, int]
                     ) -> np.ndarray:
    """Invalidate joints outside the crop (base_dataset.py:109-119)."""
    crop_y, crop_x = crop_hw
    bodys = bodys.copy()
    if len(bodys):
        bad = ((bodys[..., 0] >= crop_x) | (bodys[..., 0] < 0) |
               (bodys[..., 1] >= crop_y) | (bodys[..., 1] < 0))
        bodys[..., 3] = np.where(bad, 0, bodys[..., 3])
    return bodys


def composed_augment_sample(img: np.ndarray, bodys: np.ndarray, rng,
                            cfg: TrainConfig, crop_hw: Tuple[int, int],
                            is_coco: bool, with_augmentation: bool
                            ) -> Tuple[np.ndarray, np.ndarray, float]:
    """Single-resample augmentation: rotate+scale+crop(+flip) as ONE
    composed affine warp.

    Same random-draw order, joint geometry and integer truncations as the
    sequential chain (so joint tables are bit-compatible up to float
    rounding); the image goes through one INTER_LINEAR resample instead of
    the reference's INTER_CUBIC rotation warp followed by an INTER_LINEAR
    resize (ImageAugmentation.py:54-170) — a numerics-visible, opt-in
    deviation (TrainConfig.composed_warp) that roughly halves host
    augmentation cost on large frames.
    """
    import cv2

    crop_y, crop_x = crop_hw
    h, w = img.shape[:2]
    center = np.array([w // 2, h // 2])

    # --- consume randomness in the sequential chain's order ---
    degree = ((rng.random_sample() - 0.5) * 2 * cfg.rotate_max_deg
              if with_augmentation else 0.0)
    dice_x = rng.random_sample()
    dice_y = rng.random_sample()
    scale_random = rng.random_sample()
    do_flip = with_augmentation and rng.random_sample() <= cfg.flip_prob

    # Rotation about the image center onto an expanded canvas
    # (rotate_augment semantics).
    cx, cy = w // 2, h // 2
    M = cv2.getRotationMatrix2D((cx, cy), -degree, 1.0)
    cos, sin = abs(M[0, 0]), abs(M[0, 1])
    nw = int(h * sin + w * cos)
    nh = int(h * cos + w * sin)
    M[0, 2] += nw / 2 - cx
    M[1, 2] += nh / 2 - cy
    A = np.vstack([M, [0.0, 0.0, 1.0]])

    # Fit-scale of the rotated canvas (croppad_augment semantics).
    scale = min(crop_x / float(nw), crop_y / float(nh))
    if with_augmentation and is_coco:
        scale *= ((cfg.scale_max - cfg.scale_min) * scale_random
                  + cfg.scale_min)
    jitter_max = cfg.center_trans_max if with_augmentation else 0.0
    x_offset = int((dice_x - 0.5) * 2 * jitter_max)
    y_offset = int((dice_y - 0.5) * 2 * jitter_max)
    ctr = (center * scale + np.array([x_offset, y_offset])).astype(int)
    offset = np.array([crop_x / 2 - ctr[0], crop_y / 2 - ctr[1]], np.int64)

    A = np.diag([scale, scale, 1.0]) @ A
    A[0, 2] += offset[0]
    A[1, 2] += offset[1]
    if do_flip:
        A = np.array([[-1.0, 0.0, crop_x - 1.0],
                      [0.0, 1.0, 0.0],
                      [0.0, 0.0, 1.0]]) @ A

    out = cv2.warpAffine(img, A[:2], (crop_x, crop_y),
                         flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT,
                         borderValue=(128, 128, 128))

    bodys = bodys.copy()
    if len(bodys):
        pts = np.concatenate([bodys[..., :2],
                              np.ones((*bodys.shape[:2], 1))], axis=-1)
        bodys[..., :2] = np.einsum("ij,pkj->pki", A[:2], pts)
        if do_flip:
            bodys = bodys[:, list(FLIP_ORDER), :]
    bodys = mark_out_of_crop(bodys, crop_hw)
    return out, bodys, scale


def augment_sample(img: np.ndarray, bodys: np.ndarray, rng,
                   cfg: TrainConfig, crop_hw: Tuple[int, int],
                   is_coco: bool, with_augmentation: bool
                   ) -> Tuple[np.ndarray, np.ndarray, float]:
    """Full augmentation chain (base_dataset.py:136-149)."""
    # Composed path only when actually augmenting: without augmentation the
    # sequential chain is already a single resize resample, and composing a
    # zero-degree rotation would add a half-pixel canvas shift on odd dims.
    if cfg.composed_warp and with_augmentation:
        return composed_augment_sample(img, bodys, rng, cfg, crop_hw,
                                       is_coco, with_augmentation)
    # Center is the *pre-rotation* image center: the reference computes it in
    # get_anno (base_dataset.py:106) and aug_rotate never updates it.
    center = np.array([img.shape[1] // 2, img.shape[0] // 2])
    if with_augmentation:
        img, bodys = rotate_augment(img, bodys, rng, cfg.rotate_max_deg)
    img, bodys, scale = croppad_augment(
        img, bodys, center, rng, cfg, crop_hw,
        scale_aug=with_augmentation and is_coco,
        jitter_max=cfg.center_trans_max if with_augmentation else 0.0)
    if with_augmentation:
        img, bodys = flip_augment(img, bodys, rng, cfg.flip_prob)
    bodys = mark_out_of_crop(bodys, crop_hw)
    return img, bodys, scale
