"""Shared model building blocks (NHWC, TPU-friendly).

Re-designed equivalents of the reference's torch modules
(``model/smap.py:13-92`` in zju3dv/SMAP): convolution + batch-norm + relu
blocks, the ResNet bottleneck, and an exact ``align_corners=True`` bilinear
resize implemented as two small dense matmuls so XLA lowers it onto the MXU
instead of emitting gathers.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Row-stochastic [out, in] matrix of align_corners=True bilinear weights."""
    if in_size == 1:
        return np.ones((out_size, 1), dtype=np.float32)
    if out_size == 1:
        m = np.zeros((1, in_size), dtype=np.float32)
        m[0, 0] = 1.0
        return m
    src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 2)
    frac = src - lo
    m = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    m[rows, lo] = (1.0 - frac).astype(np.float32)
    m[rows, lo + 1] = frac.astype(np.float32)
    return m


def resize_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with ``align_corners=True`` semantics, NHWC layout.

    Matches ``F.interpolate(..., mode='bilinear', align_corners=True)`` used
    throughout the reference upsample path (model/smap.py:214,221,225,229).
    Static shapes; expressed as two contractions so XLA maps it to the MXU.
    """
    _, h, w, _ = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    wh = jnp.asarray(_interp_matrix(h, oh), dtype=x.dtype)
    ww = jnp.asarray(_interp_matrix(w, ow), dtype=x.dtype)
    # [B,H,W,C] -> [B,OH,W,C] -> [B,OH,OW,C]
    x = jnp.einsum("oh,bhwc->bowc", wh, x)
    x = jnp.einsum("pw,bowc->bopc", ww, x)
    return x


class ConvBnRelu(nn.Module):
    """Conv2d + BatchNorm + ReLU (reference: model/smap.py:13-45).

    The reference's ``efficient=True`` gradient checkpointing is replaced by
    ``jax.checkpoint`` applied at the stage level in the training step, which
    composes with XLA rematerialization instead of wrapping every conv.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    has_bn: bool = True
    has_relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.features, self.kernel_size, strides=self.strides,
                    padding=self.padding, use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        if self.has_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             param_dtype=jnp.float32, name="bn")(x)
        if self.has_relu:
            x = nn.relu(x)
        return x


class Bottleneck(nn.Module):
    """ResNet-50 bottleneck block (reference: model/smap.py:48-77)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out = ConvBnRelu(self.planes, (1, 1), dtype=self.dtype,
                         name="conv_bn_relu1")(x, train)
        out = ConvBnRelu(self.planes, (3, 3), strides=(self.stride, self.stride),
                         padding=[(1, 1), (1, 1)], dtype=self.dtype,
                         name="conv_bn_relu2")(out, train)
        out = ConvBnRelu(self.planes * self.expansion, (1, 1), has_relu=False,
                         dtype=self.dtype, name="conv_bn_relu3")(out, train)
        if self.has_downsample:
            x = ConvBnRelu(self.planes * self.expansion, (1, 1),
                           strides=(self.stride, self.stride), has_relu=False,
                           dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(out + x)


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/2 max-pool with pad=1 (torch semantics: pad with -inf)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
