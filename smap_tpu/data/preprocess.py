"""Image preprocessing: letterbox resize + pad + normalize.

Host-side (cv2) path mirrors the reference's ``CustomDataset``
(``dataset/custom_dataset.py:41-68`` in zju3dv/SMAP): aspect-preserving
resize to fit 832x512, gray(128) center padding, scale to [0,1] and
per-channel BGR normalization.

A fused on-device (XLA) variant is provided for serving pipelines where the
raw frame is already on the TPU — this realizes the intent of the
reference's unused CUDA ``resizeAndPadRbgGpu``/``reorderAndNormalize``
kernels (``extensions/gpu/cuda_cal.cu``) as one jitted op.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from smap_tpu.config import (INPUT_SHAPE, PIXEL_MEANS_BGR, PIXEL_STDS_BGR)
from smap_tpu.camera import default_scale_dict


def letterbox_image(img_bgr: np.ndarray, net_hw: Tuple[int, int] = INPUT_SHAPE
                    ) -> Tuple[np.ndarray, Dict[str, float]]:
    """cv2 letterbox matching the reference (custom_dataset.py:41-68).

    Args:
      img_bgr: [H, W, 3] uint8 BGR image.

    Returns:
      (padded uint8 [net_h, net_w, 3], scale dict with default intrinsics).
    """
    import cv2

    net_h, net_w = net_hw
    img_h, img_w = img_bgr.shape[:2]
    scale = min(net_w / img_w, net_h / img_h)
    resized = cv2.resize(img_bgr, (0, 0), fx=scale, fy=scale)
    rh, rw = resized.shape[:2]
    out = np.full((net_h, net_w, 3), 128, np.uint8)
    # Center placement; reference pads symmetrically with // splits
    # (custom_dataset.py:55-66).
    if rw < net_w:
        ml = (net_w - rw) // 2
        out[:rh, ml:ml + rw] = resized[:net_h]
    elif rh < net_h:
        mu = (net_h - rh) // 2
        out[mu:mu + rh, :rw] = resized[:, :net_w]
    else:
        out[:rh, :rw] = resized
    return out, default_scale_dict(img_w, img_h, net_w, net_h)


def normalize_image(img_bgr_u8: np.ndarray) -> np.ndarray:
    """[0,255] uint8 BGR -> normalized float32 (ToTensor+Normalize parity)."""
    means = np.asarray(PIXEL_MEANS_BGR, np.float32)
    stds = np.asarray(PIXEL_STDS_BGR, np.float32)
    return (img_bgr_u8.astype(np.float32) / 255.0 - means) / stds


def bgr_to_i420(img_bgr_u8: np.ndarray) -> np.ndarray:
    """[H, W, 3] uint8 BGR -> packed planar I420 [3H/2, W] uint8 (cv2).

    The serving wire format: video decoders (H.264/JPEG) natively produce
    YUV 4:2:0, so shipping I420 to the device moves 1.5 bytes/pixel
    instead of 3 — the host->device link, not compute, bounds the serving
    pipeline (docs/perf_notes.md). H and W must be even.
    """
    import cv2

    return cv2.cvtColor(img_bgr_u8, cv2.COLOR_BGR2YUV_I420)


def i420_to_bgr(packed_u8):
    """Device-side packed I420 [..., 3H/2, W] uint8 -> [..., H, W, 3] f32 BGR.

    Matches cv2.cvtColor(COLOR_YUV2BGR_I420) — ITU-R BT.601 studio-swing
    coefficients with nearest (2x2 replicate) chroma upsampling — within
    +-1 of the uint8 result (we keep float precision; cv2 rounds).
    Everything is dense VPU work that XLA fuses into the consumer.
    """
    import jax.numpy as jnp

    h3, w = packed_u8.shape[-2], packed_u8.shape[-1]
    h = h3 * 2 // 3
    lead = packed_u8.shape[:-2]
    y = packed_u8[..., :h, :].astype(jnp.float32)
    u = packed_u8[..., h:h + h // 4, :].reshape(*lead, h // 2, w // 2)
    v = packed_u8[..., h + h // 4:, :].reshape(*lead, h // 2, w // 2)

    def up2(c):
        c = c.astype(jnp.float32)
        c = jnp.repeat(c, 2, axis=-2)
        return jnp.repeat(c, 2, axis=-1)

    ud = up2(u) - 128.0
    vd = up2(v) - 128.0
    yd = 1.164 * (y - 16.0)
    r = yd + 1.596 * vd
    g = yd - 0.391 * ud - 0.813 * vd
    b = yd + 2.018 * ud
    return jnp.clip(jnp.stack([b, g, r], axis=-1), 0.0, 255.0)


def device_letterbox_normalize(img_bgr_u8, src_hw: Tuple[int, int],
                               net_hw: Tuple[int, int] = INPUT_SHAPE):
    """Fused on-device letterbox + normalize (static source shape).

    Uses half-pixel bilinear sampling without antialiasing (cv2
    INTER_LINEAR semantics). Returns [net_h, net_w, 3] float32.
    """
    import jax.numpy as jnp
    from jax.image import resize as jresize

    net_h, net_w = net_hw
    img_h, img_w = src_hw
    scale = min(net_w / img_w, net_h / img_h)
    rw, rh = round(img_w * scale), round(img_h * scale)
    x = img_bgr_u8.astype(jnp.float32)
    x = jresize(x, (rh, rw, 3), method="linear", antialias=False)
    canvas = jnp.full((net_h, net_w, 3), 128.0, jnp.float32)
    if rw < net_w:
        ml = (net_w - rw) // 2
        canvas = canvas.at[:min(rh, net_h), ml:ml + rw].set(x[:net_h])
    elif rh < net_h:
        mu = (net_h - rh) // 2
        canvas = canvas.at[mu:mu + rh, :min(rw, net_w)].set(x[:, :net_w])
    else:
        canvas = canvas.at[:rh, :rw].set(x[:net_h, :net_w])
    means = jnp.asarray(PIXEL_MEANS_BGR, jnp.float32)
    stds = jnp.asarray(PIXEL_STDS_BGR, jnp.float32)
    return (canvas / 255.0 - means) / stds
