"""SMAP backbone: 3-stage stacked-hourglass (MSPN-derived) network, NHWC.

TPU-native re-design of the reference model (``model/smap.py:80-421`` in
zju3dv/SMAP). Differences from the reference implementation (behavior is
equivalent; weights are interchangeable through
``smap_tpu.models.torch_convert``):

* NHWC layout throughout (TPU conv layout) instead of NCHW.
* ``align_corners=True`` bilinear upsampling expressed as matmuls (MXU)
  rather than gather-based interpolation.
* Forward returns the raw per-stage/per-scale output pyramids; loss
  computation lives in ``smap_tpu.losses`` (functional, jit-fused) instead of
  inside the module.
* Optional bfloat16 compute with float32 params/batch-stats.

Per-stage topology (reference: model/smap.py:289-310):
  ResNet-50 downsample (layers [3,4,6,3]) with cross-stage skip additions,
  then 4 ``UpsampleUnit``s, each emitting three heads — 2D heatmaps+PAFs
  (43ch), part-relative depth maps (14ch), root depth (1ch) — all bilinearly
  resized to the 1/4-resolution output shape.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from smap_tpu.config import ModelConfig
from smap_tpu.models.layers import (Bottleneck, ConvBnRelu,
                                    _FoldedBlockParams, max_pool_3x3_s2,
                                    resize_bilinear)

Dtype = Any

RESNET50_LAYERS = (3, 4, 6, 3)
# Per-level bottleneck planes are (w, 2w, 4w, 8w) for trunk width w;
# the reference's ResNet-50 is w=64 -> (64, 128, 256, 512) with decoder
# inputs (2048, 1024, 512, 256) (model/smap.py:95-154).

# Fused Pallas stem (conv7x7/2 + bias + relu + maxpool3x3/2 in one HBM
# pass, smap_tpu/ops/fused_stem.py) on the BN-folded serving path. The
# stem (run once per forward) is the forward's worst section per FLOP on
# the target part (3% MFU conv + ~8x-over-bound reduce_window = 4.7 of
# 60 ms, docs/perf_notes.md round-4). Default set by the stem-probe A/B.
FUSE_STEM = os.environ.get("SMAP_TPU_FUSE_STEM", "0") == "1"


class ResNetTop(nn.Module):
    """Stem: 7x7/2 conv + 3x3/2 max-pool (reference: model/smap.py:80-92).

    Under ``quant="folded"`` (BN folded into conv kernel/bias by
    smap_tpu.models.quantize.fold_bn_variables) with ``FUSE_STEM`` on,
    the whole stem executes as one fused Pallas kernel from the double
    space-to-depth layout. Parameter tree is unchanged (same
    ``conv/conv/{kernel,bias}`` leaves as the folded ConvBnRelu path).
    """

    quant: Any = False   # False | True (dynamic int8) | "static" | "folded"
    dtype: Dtype = jnp.float32
    width: int = 64

    def _fuse_eligible(self, x: jnp.ndarray) -> bool:
        from smap_tpu.ops.fused_stem import TILE_P

        return (FUSE_STEM and self.quant == "folded" and self.width == 64
                and x.shape[1] % (4 * TILE_P) == 0 and x.shape[2] % 4 == 0)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self._fuse_eligible(x):
            from smap_tpu.ops.fused_stem import (double_space_to_depth,
                                                 fused_stem)

            kernel, bias = _FoldedBlockParams(
                64, (7, 7), name="conv")(x.shape[-1])
            y = fused_stem(double_space_to_depth(x.astype(self.dtype)),
                           kernel.astype(self.dtype), bias,
                           interpret=jax.default_backend() == "cpu")
            return y.astype(self.dtype)
        x = ConvBnRelu(self.width, (7, 7), strides=(2, 2),
                       padding=[(3, 3), (3, 3)],
                       quant=self.quant, dtype=self.dtype,
                       name="conv")(x, train)
        return max_pool_3x3_s2(x)


class DownsampleModule(nn.Module):
    """ResNet-50 trunk emitting 4 scales (reference: model/smap.py:95-154)."""

    has_skip: bool = False
    quant: Any = False   # False | True (dynamic int8) | "static"
    dtype: Dtype = jnp.float32
    width: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 skip1: Optional[List[jnp.ndarray]],
                 skip2: Optional[List[jnp.ndarray]],
                 train: bool = False) -> Tuple[jnp.ndarray, ...]:
        feats = []
        in_planes = self.width
        planes_per_level = tuple(self.width << i for i in range(4))
        for li, (planes, blocks) in enumerate(zip(planes_per_level,
                                                  RESNET50_LAYERS)):
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                has_ds = bi == 0 and (s != 1 or in_planes != planes * 4)
                x = Bottleneck(planes, stride=s, has_downsample=has_ds,
                               quant=self.quant, dtype=self.dtype,
                               name=f"layer{li + 1}_{bi}")(x, train)
                in_planes = planes * 4
            if self.has_skip:
                x = x + skip1[li] + skip2[li]
            feats.append(x)
        x1, x2, x3, x4 = feats
        return x4, x3, x2, x1


class UpsampleUnit(nn.Module):
    """One decoder step with three prediction heads
    (reference: model/smap.py:157-241).

    ``heads`` statically masks the (res, res_d, res_rd) head computations:
    the heads are pure outputs (nothing downstream consumes them except the
    loss / deployment readout), so inference skips the ones it never reads
    — see :meth:`SMAP.infer`. Masked heads return None and their parameters
    are simply not touched (unused entries in the supplied variables are
    ignored by Flax).
    """

    ind: int
    up_size: Tuple[int, int]
    output_shape: Tuple[int, int]
    kpt_paf_channels: int
    depth_channels: int
    chl_num: int = 256
    gen_skip: bool = False
    gen_cross_conv: bool = False
    heads: Tuple[bool, bool, bool] = (True, True, True)
    quant: Any = False   # False | True (dynamic int8) | "static"
    dtype: Dtype = jnp.float32
    cross_channels: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, up_x: Optional[jnp.ndarray],
                 train: bool = False):
        out = ConvBnRelu(self.chl_num, (1, 1), has_relu=False,
                         quant=self.quant, dtype=self.dtype,
                         name="u_skip")(x, train)
        if self.ind > 0:
            up_x = resize_bilinear(up_x, self.up_size)
            up_x = ConvBnRelu(self.chl_num, (1, 1), has_relu=False,
                              quant=self.quant, dtype=self.dtype,
                              name="up_conv")(up_x, train)
            out = out + up_x
        out = nn.relu(out)

        def head(prefix: str, channels: int) -> jnp.ndarray:
            h = ConvBnRelu(self.chl_num, (1, 1), quant=self.quant,
                           dtype=self.dtype,
                           name=f"{prefix}_conv1")(out, train)
            h = ConvBnRelu(channels, (3, 3), padding=[(1, 1), (1, 1)],
                           has_relu=False, quant=self.quant,
                           dtype=self.dtype,
                           name=f"{prefix}_conv2")(h, train)
            return resize_bilinear(h, self.output_shape)

        res = head("res", self.kpt_paf_channels) if self.heads[0] else None
        res_d = (head("res_d", self.depth_channels) if self.heads[1]
                 else None)
        res_rd = head("res_rd", 1) if self.heads[2] else None

        skip1 = skip2 = None
        if self.gen_skip:
            in_planes = x.shape[-1]
            skip1 = ConvBnRelu(in_planes, (1, 1), quant=self.quant,
                               dtype=self.dtype, name="skip1")(x, train)
            skip2 = ConvBnRelu(in_planes, (1, 1), quant=self.quant,
                               dtype=self.dtype, name="skip2")(out, train)

        cross_conv = None
        if self.ind == 3 and self.gen_cross_conv:
            cross_conv = ConvBnRelu(self.cross_channels, (1, 1),
                                    quant=self.quant, dtype=self.dtype,
                                    name="cross_conv")(out, train)
        return out, res, res_d, res_rd, skip1, skip2, cross_conv


ALL_HEADS = ((True, True, True),) * 4


class UpsampleModule(nn.Module):
    """4-scale decoder (reference: model/smap.py:244-286).

    ``head_spec[i]`` statically masks unit ``i``'s (res, res_d, res_rd)
    heads — see :class:`UpsampleUnit`.
    """

    output_shape: Tuple[int, int]
    kpt_paf_channels: int
    depth_channels: int
    chl_num: int = 256
    gen_skip: bool = False
    gen_cross_conv: bool = False
    head_spec: Tuple[Tuple[bool, bool, bool], ...] = ALL_HEADS
    quant: Any = False   # False | True (dynamic int8) | "static"
    dtype: Dtype = jnp.float32
    cross_channels: int = 64

    @nn.compact
    def __call__(self, x4, x3, x2, x1, train: bool = False):
        h, w = self.output_shape
        up_sizes = [(h // 8, w // 8), (h // 4, w // 4), (h // 2, w // 2), (h, w)]
        inputs = [x4, x3, x2, x1]
        res, res_d, res_rd, skip1, skip2 = [], [], [], [], []
        out = None
        cross_conv = None
        for i in range(4):
            unit = UpsampleUnit(
                ind=i, up_size=up_sizes[i], output_shape=self.output_shape,
                kpt_paf_channels=self.kpt_paf_channels,
                depth_channels=self.depth_channels, chl_num=self.chl_num,
                gen_skip=self.gen_skip, gen_cross_conv=self.gen_cross_conv,
                heads=self.head_spec[i], quant=self.quant,
                dtype=self.dtype, cross_channels=self.cross_channels,
                name=f"up{i + 1}")
            out, r, rd, rrd, s1, s2, cc = unit(inputs[i], out, train)
            res.append(r)
            res_d.append(rd)
            res_rd.append(rrd)
            skip1.append(s1)
            skip2.append(s2)
            if cc is not None:
                cross_conv = cc
        # skip lists are consumed finest-first by the next stage's trunk
        # (reference: model/smap.py:283-284).
        skip1 = skip1[::-1]
        skip2 = skip2[::-1]
        return res, res_d, res_rd, skip1, skip2, cross_conv


class Stage(nn.Module):
    """Downsample + upsample hourglass (reference: model/smap.py:289-310)."""

    output_shape: Tuple[int, int]
    kpt_paf_channels: int
    depth_channels: int
    chl_num: int = 256
    has_skip: bool = False
    gen_skip: bool = False
    gen_cross_conv: bool = False
    head_spec: Tuple[Tuple[bool, bool, bool], ...] = ALL_HEADS
    quant: Any = False   # False | True (dynamic int8) | "static"
    dtype: Dtype = jnp.float32
    trunk_width: int = 64

    @nn.compact
    def __call__(self, x, skip1, skip2, train: bool = False):
        x4, x3, x2, x1 = DownsampleModule(
            has_skip=self.has_skip, quant=self.quant, dtype=self.dtype,
            width=self.trunk_width, name="downsample")(x, skip1, skip2,
                                                       train)
        return UpsampleModule(
            output_shape=self.output_shape,
            kpt_paf_channels=self.kpt_paf_channels,
            depth_channels=self.depth_channels, chl_num=self.chl_num,
            gen_skip=self.gen_skip, gen_cross_conv=self.gen_cross_conv,
            head_spec=self.head_spec, quant=self.quant,
            dtype=self.dtype, cross_channels=self.trunk_width,
            name="upsample")(x4, x3, x2, x1, train)


class SMAP(nn.Module):
    """Full SMAP network (reference: model/smap.py:313-421).

    ``__call__`` returns a dict of per-stage lists (coarse-to-fine order):
      heatmap_2d: [stage][scale] -> [B, H, W, 43]
      det_d:      [stage][scale] -> [B, H, W, 14]
      root_d:     [stage][scale] -> [B, H, W, 1]
    ``infer`` returns the deployment triple: summed finest-3 2D maps of the
    last stage, plus its finest depth maps (reference: model/smap.py:417-419).
    """

    cfg: ModelConfig = ModelConfig()

    def _dtype(self):
        return jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32

    @nn.compact
    def __call__(self, imgs: jnp.ndarray, train: bool = False,
                 head_specs: Optional[Tuple] = None
                 ) -> Dict[str, List[List[jnp.ndarray]]]:
        """Run all stages. ``head_specs[stage]`` optionally masks head
        computations per stage/unit (statically — see UpsampleUnit.heads);
        masked entries come back as None. Default: every head (training
        needs the full per-stage/per-scale pyramids for the loss,
        losses.py; reference model/smap.py:330-401 likewise always
        computes them)."""
        dtype = self._dtype()
        x = imgs.astype(dtype)
        x = ResNetTop(quant=self.cfg.quantized, dtype=dtype,
                      width=self.cfg.trunk_width, name="top")(x, train)
        outputs = {"heatmap_2d": [], "det_d": [], "root_d": []}
        skip1 = skip2 = None
        stage_cls = Stage
        if self.cfg.remat and train:
            # Gradient checkpointing at stage granularity (reference wraps
            # every conv in torch checkpoint when RUN_EFFICIENT,
            # model/smap.py:40-43; stage-level remat trades the same memory
            # for fewer recompute boundaries).
            stage_cls = nn.remat(Stage, static_argnums=(4,))

        def cast(r):
            return None if r is None else r.astype(jnp.float32)

        for i in range(self.cfg.stage_num):
            last = i == self.cfg.stage_num - 1
            res, res_d, res_rd, skip1, skip2, x = stage_cls(
                output_shape=self.cfg.output_shape,
                kpt_paf_channels=self.cfg.kpt_paf_channels,
                depth_channels=self.cfg.num_limbs,
                chl_num=self.cfg.upsample_channels,
                has_skip=i > 0, gen_skip=not last, gen_cross_conv=not last,
                head_spec=(ALL_HEADS if head_specs is None
                           else head_specs[i]),
                quant=self.cfg.quantized, trunk_width=self.cfg.trunk_width,
                dtype=dtype, name=f"stage{i}")(x, skip1, skip2, train)
            outputs["heatmap_2d"].append([cast(r) for r in res])
            outputs["det_d"].append([cast(r) for r in res_d])
            outputs["root_d"].append([cast(r) for r in res_rd])
        return outputs

    def infer(self, imgs: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        # The deployment readout consumes only the LAST stage's finest-3
        # 2D maps and its finest depth maps, so every other head — all 12
        # heads of each earlier stage, and the coarse depth heads of the
        # last — is statically skipped (~15% of forward FLOPs; the trunk,
        # decoder and cross-stage skips are unchanged). The reference
        # computes every head and discards them (model/smap.py:403-419).
        off = (False, False, False)
        none_stage = (off,) * 4
        last_stage = (off, (True, False, False), (True, False, False),
                      (True, True, True))
        head_specs = (none_stage,) * (self.cfg.stage_num - 1) + (last_stage,)
        outputs = self(imgs, train=False, head_specs=head_specs)
        hm = outputs["heatmap_2d"][-1]
        outputs_2d = hm[-1] + hm[-2] + hm[-3]
        return outputs_2d, outputs["det_d"][-1][-1], outputs["root_d"][-1][-1]
