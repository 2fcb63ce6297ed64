"""Shared model building blocks (NHWC, TPU-friendly).

Re-designed equivalents of the reference's torch modules
(``model/smap.py:13-92`` in zju3dv/SMAP): convolution + batch-norm + relu
blocks, the ResNet bottleneck, and an exact ``align_corners=True`` bilinear
resize implemented as two small dense matmuls so XLA lowers it onto the MXU
instead of emitting gathers.
"""

from __future__ import annotations

import functools
import os
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


import os

# Convolution lowering strategy: "xla" (native convolution, ~58 TFLOPS on
# the target TPU — scripts/_conv_probe_v2.py) or "matmul" (k*k shifted
# matmuls accumulated in f32, useful as a fallback on backends whose conv
# lowering misses the MXU).
CONV_IMPL = os.environ.get("SMAP_TPU_CONV_IMPL", "xla")


def matmul_conv2d(x: jnp.ndarray, kernel: jnp.ndarray,
                  strides: Tuple[int, int],
                  padding: Sequence[Tuple[int, int]]) -> jnp.ndarray:
    """SAME-family 2D conv as a sum of shifted matmuls (MXU path).

    Args:
      x: [B, H, W, Cin]; kernel: [kh, kw, Cin, Cout].
      padding: ((top, bottom), (left, right)).

    Accumulates in float32 and returns x.dtype.
    """
    b, _, _, cin = x.shape
    kh, kw, _, cout = kernel.shape
    sh, sw = strides
    xp = jnp.pad(x, ((0, 0), padding[0], padding[1], (0, 0)))
    hp, wp = xp.shape[1], xp.shape[2]
    ho = (hp - kh) // sh + 1
    wo = (wp - kw) // sw + 1
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            patch = jax.lax.slice(
                xp, (0, dy, dx, 0),
                (b, dy + sh * (ho - 1) + 1, dx + sw * (wo - 1) + 1, cin),
                (1, sh, sw, 1))
            term = jnp.einsum("bhwc,cd->bhwd", patch, kernel[dy, dx],
                              preferred_element_type=jnp.float32)
            acc = term if acc is None else acc + term
    return acc.astype(x.dtype)


# Stem lowering: "s2d" rewrites the 7x7/2 RGB stem conv as a 2x2
# space-to-depth + 4x4/1 conv over 4*Cin channels — identical
# multiply-adds with the channel (lane) dim at 12 instead of 3. Default
# OFF: measured slightly SLOWER than the direct lowering (5.6 vs 4.7
# ms/op incl. pool — the XLA transpose costs more than the channels
# save; the Cin=3 conv's wall isn't lane starvation, perf_notes
# round-4). The stem lever that wins is the fused Pallas stem
# (smap_tpu/ops/fused_stem.py) on the serving path.
STEM_IMPL = os.environ.get("SMAP_TPU_STEM_IMPL", "conv")


def s2d_conv7x7s2(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Exact 7x7 stride-2 pad-3 NHWC conv via 2x2 space-to-depth.

    out[i,j] = sum_{u,v,c} x[2i+u-3, 2j+v-3, c] * k[u,v,c]. Substituting
    m = 2i+u-3 = 2(i+p-2)+a with u' = u+1 = 2p+a (p in 0..3, a in 0..1;
    u'=0 is the zero tap row) turns it into a 4x4 stride-1 conv with
    padding (2,1) over y[r,s,(a,b,c)] = x[2r+a, 2s+b, c]. H and W must be
    even (the model's inputs are). Same contraction terms -> numerically
    identical to the direct conv up to f32-accumulation order.
    """
    b, h, w, c = x.shape
    kh, kw, _, co = kernel.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    kp = jnp.zeros((kh + 1, kw + 1, c, co), kernel.dtype)
    kp = kp.at[1:, 1:].set(kernel)
    k2 = kp.reshape(4, 2, 4, 2, c, co).transpose(0, 2, 1, 3, 4, 5)
    k2 = k2.reshape(4, 4, 4 * c, co)
    return jax.lax.conv_general_dilated(
        y, k2, (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class Conv2D(nn.Module):
    """2D convolution with selectable lowering; parameters match nn.Conv
    (HWIO 'kernel' + 'bias') so torch-checkpoint conversion is unchanged.

    ``quant=True`` switches to the int8 serving path: parameters are the
    pre-quantized {kernel_q int8, kernel_scale f32[co], bias f32} produced
    by smap_tpu.models.quantize.quantize_variables (BN already folded into
    them), activations are dynamically quantized per tensor on device, and
    the conv runs int8 x int8 -> int32 on the MXU (2x the bf16 rate on
    v5e). Output is dequantized f32 then cast to ``dtype``.

    ``quant="static"`` replaces the per-call activation abs-max reduction
    with a frozen per-conv ``act_scale`` parameter (produced by
    smap_tpu.models.quantize.calibrate_activation_scales): no reduction
    serializes between convs, at the cost of clipping activations that
    exceed the calibration range. The dynamic mode sows its observed
    abs-max (``intermediates/act_absmax``) so calibration is just a
    mutable apply of the dynamic graph.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Sequence[Tuple[int, int]] = ((0, 0), (0, 0))
    quant: Any = False   # False | True (dynamic int8) | "static"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        if self.quant and self.quant != "folded":
            kernel_q = self.param("kernel_q", nn.initializers.zeros,
                                  (kh, kw, cin, self.features), jnp.int8)
            kernel_scale = self.param("kernel_scale", nn.initializers.ones,
                                      (self.features,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            xf = x.astype(jnp.float32)
            if self.quant == "static":
                # Initialized to 0 — an INVALID sentinel, not a usable
                # scale: init-produced static variables must go through
                # quantize.calibrate_activation_scales before serving, and
                # the engine (SMAPInference) rejects non-positive scales
                # loudly via quantize.check_static_scales instead of
                # silently serving garbage at scale 1.0.
                s_x = self.param("act_scale", nn.initializers.zeros,
                                 (), jnp.float32)
            else:
                absmax = jnp.max(jnp.abs(xf))
                self.sow("intermediates", "act_absmax", absmax)
                # Explicit multiply-by-reciprocal, NOT /127.0: XLA rewrites
                # constant-divisor division to this anyway, and spelling it
                # out lets the static calibration (quantize.py) reproduce
                # the scale BIT-exactly on host — a 1-ulp scale difference
                # moves round() boundaries and cascades through the net.
                s_x = jnp.maximum(absmax, 1e-6) * jnp.float32(1.0 / 127.0)
            xq = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, kernel_q, self.strides, list(self.padding),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (s_x * kernel_scale) + bias
            return y.astype(self.dtype)
        kernel = self.param(
            "kernel", nn.initializers.kaiming_normal(),
            (kh, kw, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        if (STEM_IMPL == "s2d" and (kh, kw) == (7, 7)
                and self.strides == (2, 2) and cin <= 4
                and tuple(map(tuple, self.padding)) == ((3, 3), (3, 3))
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            return s2d_conv7x7s2(x, kernel) + bias.astype(self.dtype)
        if CONV_IMPL == "matmul":
            y = matmul_conv2d(x, kernel, self.strides, self.padding)
        else:
            y = jax.lax.conv_general_dilated(
                x, kernel, self.strides, list(self.padding),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(y.dtype)


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
    quant: Any = False   # False | True (dynamic int8) | "static"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.padding == "SAME":
            kh, kw = self.kernel_size
            pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
        else:
            pad = tuple(tuple(p) for p in self.padding)
        x = Conv2D(self.features, self.kernel_size, strides=self.strides,
                   padding=pad, quant=self.quant, dtype=self.dtype,
                   name="conv")(x)
        if self.has_bn and not self.quant:
            # quant/"folded" modes: BN is already folded into the serving
            # kernel/bias (smap_tpu.models.quantize.quantize_variables /
            # fold_bn_variables), inference-only by construction.
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             param_dtype=jnp.float32, name="bn")(x)
        if self.has_relu:
            x = nn.relu(x)
        return x


class _ConvParams(nn.Module):
    """Param-only stand-in for a BN-folded Conv2D: owns the identical
    ``{kernel, bias}`` leaves (same shapes/initializers) but returns them
    for a fused Pallas kernel instead of applying a convolution."""

    features: int
    kernel_size: Tuple[int, int]

    @nn.compact
    def __call__(self, cin: int):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.kaiming_normal(),
                            (kh, kw, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class _FoldedBlockParams(nn.Module):
    """Param-only stand-in for a folded ConvBnRelu block (the fused
    bottleneck path): same ``{conv: {kernel, bias}}`` subtree as
    ConvBnRelu consumes after quantize.fold_bn_variables."""

    features: int
    kernel_size: Tuple[int, int]

    @nn.compact
    def __call__(self, cin: int):
        return _ConvParams(self.features, self.kernel_size,
                           name="conv")(cin)


# Fused-bottleneck serving kernel (quant="folded"): default OFF — built
# on the HBM-traffic argument but measured SLOWER than the unfused XLA
# block on hardware (25-28 vs 17 ms per 12-block chain; the in-VMEM
# matmuls are lane-starved at N=Cm=64 and the VPU work between them
# serializes — docs/perf_notes.md round-4). SMAP_TPU_FUSE_BOTTLENECK=1
# re-enables for A/B.
FUSE_BOTTLENECK = os.environ.get("SMAP_TPU_FUSE_BOTTLENECK", "0") == "1"


class Bottleneck(nn.Module):
    """ResNet-50 bottleneck block (reference: model/smap.py:48-77).

    Under ``quant="folded"`` (BN already folded into conv kernel/bias by
    smap_tpu.models.quantize.fold_bn_variables), stride-1 blocks in the
    HBM-bound high-spatial/low-channel regime execute as ONE fused Pallas
    kernel (smap_tpu.ops.fused_block) that keeps the 64-ch intermediates
    in VMEM — docs/perf_notes.md round-4: the unfused block is
    bandwidth-bound at 16 TFLOPS at the layer1 shape. Parameter tree is
    unchanged (same {conv_bn_relu*/conv/{kernel,bias}} leaves).
    """

    planes: int
    stride: int = 1
    has_downsample: bool = False
    quant: Any = False   # False | True (dynamic int8) | "static" | "folded"
    dtype: Dtype = jnp.float32
    expansion: int = 4

    def _fuse_eligible(self, x: jnp.ndarray) -> bool:
        from smap_tpu.ops.fused_block import TILE_ROWS

        return (FUSE_BOTTLENECK and self.quant == "folded"
                and self.stride == 1 and self.planes <= 64
                and x.shape[1] % TILE_ROWS == 0)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self._fuse_eligible(x):
            from smap_tpu.ops.fused_block import fused_bottleneck

            cin = x.shape[-1]
            cout = self.planes * self.expansion
            w1, b1 = _FoldedBlockParams(self.planes, (1, 1),
                                        name="conv_bn_relu1")(cin)
            w2, b2 = _FoldedBlockParams(self.planes, (3, 3),
                                        name="conv_bn_relu2")(self.planes)
            w3, b3 = _FoldedBlockParams(cout, (1, 1),
                                        name="conv_bn_relu3")(self.planes)
            wd = bd = None
            if self.has_downsample:
                wd, bd = _FoldedBlockParams(cout, (1, 1),
                                            name="downsample")(cin)
            y = fused_bottleneck(
                x, w1[0, 0], b1, w2, b2, w3[0, 0], b3,
                None if wd is None else wd[0, 0], bd,
                interpret=jax.default_backend() == "cpu")
            return y.astype(self.dtype)
        out = ConvBnRelu(self.planes, (1, 1), quant=self.quant,
                         dtype=self.dtype, name="conv_bn_relu1")(x, train)
        out = ConvBnRelu(self.planes, (3, 3), strides=(self.stride, self.stride),
                         padding=[(1, 1), (1, 1)], quant=self.quant,
                         dtype=self.dtype, name="conv_bn_relu2")(out, train)
        out = ConvBnRelu(self.planes * self.expansion, (1, 1), has_relu=False,
                         quant=self.quant, dtype=self.dtype,
                         name="conv_bn_relu3")(out, train)
        if self.has_downsample:
            x = ConvBnRelu(self.planes * self.expansion, (1, 1),
                           strides=(self.stride, self.stride), has_relu=False,
                           quant=self.quant, dtype=self.dtype,
                           name="downsample")(x, train)
        return nn.relu(out + x.astype(out.dtype))


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/2 max-pool with pad=1 (torch semantics: pad with -inf)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
