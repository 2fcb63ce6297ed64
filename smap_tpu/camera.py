"""Camera math: back-projection and letterbox coordinate transforms.

Vectorized (jax.numpy) equivalents of the reference's numpy helpers
(``lib/utils/post_3d.py:4-27`` and the un-letterboxing in
``exps/stage3_root2/test_util.py:89-99`` of zju3dv/SMAP).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def back_project(xy: jnp.ndarray, depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Back-project 2D pixel coords to camera-space 3D points.

    Reference: lib/utils/post_3d.py:4-16.

    Args:
      xy: [..., 2] pixel coordinates.
      depth: [...] metric depth per point.
      K: [3, 3] camera intrinsics.

    Returns:
      [..., 3] camera-space points.
    """
    X = (xy[..., 0] - K[0, 2]) * depth / K[0, 0]
    Y = (xy[..., 1] - K[1, 2]) * depth / K[1, 1]
    return jnp.stack([X, Y, depth], axis=-1)


def unletterbox(xy: jnp.ndarray, scale: float, net_w: int, net_h: int,
                img_w: float, img_h: float) -> jnp.ndarray:
    """Map net-input pixel coords back to original-image coords.

    Mirrors exps/stage3_root2/test_util.py:89-92: the net input is an
    aspect-preserving resize by ``scale`` centered in a ``net_w x net_h``
    canvas; padding is split evenly on both sides.
    """
    x = xy[..., 0] / scale - (net_w / scale - img_w) / 2.0
    y = xy[..., 1] / scale - (net_h / scale - img_h) / 2.0
    return jnp.stack([x, y], axis=-1)


def letterbox_scale(img_w: int, img_h: int, net_w: int, net_h: int) -> float:
    """Aspect-preserving fit scale (reference: dataset/custom_dataset.py:45)."""
    return min(net_w / float(img_w), net_h / float(img_h))


def intrinsics_from_scale(scale: Dict[str, float]) -> jnp.ndarray:
    """Build K from a scale-dict (reference: exps/stage3_root2/test_util.py:93)."""
    return jnp.asarray([
        [scale["f_x"], 0.0, scale["cx"]],
        [0.0, scale["f_y"], scale["cy"]],
        [0.0, 0.0, 1.0],
    ], dtype=jnp.float32)


def default_scale_dict(img_w: int, img_h: int,
                       net_w: int = 832, net_h: int = 512) -> Dict[str, float]:
    """Scale metadata with fake intrinsics fx=fy=W (reference:
    exps/stage3_root2/test.py:99-103)."""
    return {
        "scale": letterbox_scale(img_w, img_h, net_w, net_h),
        "img_width": float(img_w),
        "img_height": float(img_h),
        "net_width": float(net_w),
        "net_height": float(net_h),
        "f_x": float(img_w),
        "f_y": float(img_w),
        "cx": img_w / 2.0,
        "cy": img_h / 2.0,
    }
