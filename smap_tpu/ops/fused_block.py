"""Fused ResNet-bottleneck Pallas kernel for the HBM-bound layer1 blocks.

Why this kernel exists (docs/perf_notes.md round-4 conv-ceiling probe,
scripts/probes/_dot1x1_probe.py): at the network's layer1 shape —
128x208 spatial, 256<->64 channels, batch 16 — the 1x1 convolutions run
at ~16 TFLOPS (8% MFU) on the target v5e while the same chip does 175
TFLOPS on big matmuls. They are HBM-bandwidth-bound: the unfused block
moves the 218 MB 256-channel activation through HBM five times per
bottleneck (read for conv1, write+read the 64-ch intermediate twice,
write conv3, re-read x for the residual). XLA cannot fuse ACROSS the
matmuls. This kernel keeps every intermediate of one bottleneck block —
conv1x1 -> relu -> conv3x3 -> relu -> conv1x1 -> +residual -> relu — in
VMEM, so HBM sees exactly one read of x and one write of the output
(436 MB instead of ~980 MB per block at batch 16).

Semantics: inference-only, stride-1, SAME-padded 3x3, BatchNorm already
folded into each conv's kernel/bias (smap_tpu.models.quantize.
fold_bn_variables). Matches the reference block model/smap.py:48-77 with
running-stats BN. bf16 operands, f32 MXU accumulation.

Layout: grid (B, H/TILE_ROWS); each program consumes a row-band of x
plus a 1-row halo on each side for the 3x3. The halo rows arrive as two
extra 1-row BlockSpec inputs whose index maps clamp at the image edge
(the kernel zeroes them there — SAME zero padding), so Mosaic
double-buffers all input bands across grid steps and the HBM reads
overlap compute; no manual DMA needed.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows of output computed per grid program. 8 keeps per-program VMEM
# (input band + halos + 64-ch intermediates + f32 accumulators + output
# band, double-buffered) well under the 16 MB core budget at W=208,
# C=256. Overridable for A/B probes (scripts/probes/_fused_block_probe).
TILE_ROWS = int(os.environ.get("SMAP_TPU_FUSE_TILE_ROWS", "8"))
# conv2 as one im2col matmul (K=9*Cm) vs 9 shifted K=Cm matmuls.
IM2COL = os.environ.get("SMAP_TPU_FUSE_IM2COL", "1") != "0"


def _kernel(top_ref, body_ref, bot_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            w3_ref, b3_ref, out_ref, *, tile_rows: int, im2col: bool,
            wd_ref=None, bd_ref=None):
    """One (batch image, row band) bottleneck step, fully in VMEM.

    top/bot: [1, 1, W, Cin] halo rows (edge-clamped; zeroed here at the
    edges). body: [1, T, W, Cin]. w1 [Cin, Cm], w2 [3, 3, Cm, Cm],
    w3 [Cm, Cout], optional wd [Cin, Cout] (projection residual);
    biases [1, C*] f32. out: [1, T, W, Cout].
    """
    t = pl.program_id(1)
    last = pl.num_programs(1) - 1
    body = body_ref[0]                                   # [T, W, Cin]
    tile, w, cin = body.shape
    cm = w2_ref.shape[-1]
    f32 = jnp.float32

    xs = jnp.concatenate([top_ref[0], body, bot_ref[0]], axis=0)

    # conv1 (1x1, Cin -> Cm) over the band INCLUDING halo rows, so conv2's
    # vertical taps are all resident.
    rows = xs.reshape((tile + 2) * w, cin)
    y = jnp.dot(rows, w1_ref[:], preferred_element_type=f32)
    y = jnp.maximum(y + b1_ref[:], 0.0).astype(jnp.bfloat16)
    y = y.reshape(tile + 2, w, cm)
    # SAME zero padding at the image edges applies to conv2's INPUT map y
    # (the halo row of x is edge-clamped garbage there, and conv1 of even
    # a zero row would yield relu(b1), not 0).
    zrow = jnp.zeros((1, w, cm), jnp.bfloat16)
    y = jnp.concatenate([jnp.where(t == 0, zrow, y[:1]), y[1:tile + 1],
                         jnp.where(t == last, zrow, y[tile + 1:])], axis=0)
    # SAME width padding for the 3x3.
    zcol = jnp.zeros((tile + 2, 1, cm), jnp.bfloat16)
    y = jnp.concatenate([zcol, y, zcol], axis=1)         # [T+2, W+2, Cm]

    # conv2 (3x3, stride 1): either 9 shifted [rows,Cm]x[Cm,Cm] matmuls
    # accumulated in f32, or ONE im2col [rows,9*Cm]x[9*Cm,Cm] matmul
    # (K=9*Cm fills the MXU's contraction dim where K=Cm=64 runs it at
    # half depth; costs a lane-dim concat of the 9 shifted views).
    if im2col:
        patches = jnp.concatenate(
            [y[dy:dy + tile, dx:dx + w, :].reshape(tile * w, cm)
             for dy in range(3) for dx in range(3)], axis=1)
        acc = jnp.dot(patches, w2_ref[:].reshape(9 * cm, cm),
                      preferred_element_type=f32)
    else:
        acc = jnp.zeros((tile * w, cm), f32)
        for dy in range(3):
            for dx in range(3):
                patch = y[dy:dy + tile, dx:dx + w, :].reshape(tile * w, cm)
                acc += jnp.dot(patch, w2_ref[dy, dx],
                               preferred_element_type=f32)
    z = jnp.maximum(acc + b2_ref[:], 0.0).astype(jnp.bfloat16)

    # conv3 (1x1, Cm -> Cout) + residual + relu.
    o = jnp.dot(z, w3_ref[:], preferred_element_type=f32) + b3_ref[:]
    res = body.reshape(tile * w, cin)
    if wd_ref is not None:
        res = jnp.dot(res, wd_ref[:], preferred_element_type=f32) \
            + bd_ref[:]
    else:
        res = res.astype(f32)
    out = jnp.maximum(o + res, 0.0).astype(out_ref.dtype)
    out_ref[0] = out.reshape(tile, w, out_ref.shape[-1])


@functools.partial(jax.jit,
                   static_argnames=("tile_rows", "im2col", "interpret"))
def fused_bottleneck(x: jnp.ndarray,
                     w1: jnp.ndarray, b1: jnp.ndarray,
                     w2: jnp.ndarray, b2: jnp.ndarray,
                     w3: jnp.ndarray, b3: jnp.ndarray,
                     wd: Optional[jnp.ndarray] = None,
                     bd: Optional[jnp.ndarray] = None,
                     tile_rows: int = TILE_ROWS,
                     im2col: bool = IM2COL,
                     interpret: bool = False) -> jnp.ndarray:
    """relu(conv1x1(relu(conv3x3(relu(conv1x1(x))))) + residual), fused.

    Args:
      x: [B, H, W, Cin] (any float dtype; computed in bf16/f32-accum).
      w1: [Cin, Cm]; w2: [3, 3, Cm, Cm]; w3: [Cm, Cout]; biases f32.
      wd/bd: optional [Cin, Cout] projection for the residual (the
        reference block's `downsample`, model/smap.py:69-74). Without
        them Cin must equal Cout (identity residual).
      tile_rows: output rows per grid program; must divide H.

    Returns [B, H, W, Cout] bf16.
    """
    b, h, w, cin = x.shape
    cm = w2.shape[-1]
    cout = w3.shape[-1]
    if h % tile_rows:
        raise ValueError(f"H={h} not divisible by tile_rows={tile_rows}")
    if wd is None and cin != cout:
        raise ValueError("identity residual needs Cin == Cout")
    grid = (b, h // tile_rows)
    bf16 = jnp.bfloat16
    x = x.astype(bf16)

    def row_spec(row_of):
        return pl.BlockSpec((1, 1, w, cin),
                            lambda bi, ti: (bi, row_of(ti), 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        # Halo rows, edge-clamped (kernel zeroes them at the edges).
        row_spec(lambda ti: jnp.maximum(ti * tile_rows - 1, 0)),
        pl.BlockSpec((1, tile_rows, w, cin), lambda bi, ti: (bi, ti, 0, 0),
                     memory_space=pltpu.VMEM),
        row_spec(lambda ti: jnp.minimum(ti * tile_rows + tile_rows, h - 1)),
    ]
    full = lambda a: pl.BlockSpec(a.shape, lambda bi, ti: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    args = [x, x, x]
    weights = [(w1.astype(bf16)), b1.reshape(1, cm).astype(jnp.float32),
               w2.astype(bf16), b2.reshape(1, cm).astype(jnp.float32),
               w3.astype(bf16), b3.reshape(1, cout).astype(jnp.float32)]
    kern = functools.partial(_kernel, tile_rows=tile_rows, im2col=im2col)
    if wd is not None:
        weights += [wd.astype(bf16), bd.reshape(1, cout).astype(jnp.float32)]

        def kern(*refs, tile_rows=tile_rows, im2col=im2col):  # noqa: F811
            (top, body, bot, w1r, b1r, w2r, b2r, w3r, b3r, wdr, bdr,
             out) = refs
            _kernel(top, body, bot, w1r, b1r, w2r, b2r, w3r, b3r, out,
                    tile_rows=tile_rows, im2col=im2col, wd_ref=wdr,
                    bd_ref=bdr)

    args += weights
    in_specs += [full(a) for a in weights]

    flops = 2 * b * h * w * cm * (cin + 9 * cm + cout
                                  + (cin if wd is not None else 0))
    bytes_accessed = 2 * b * h * w * (cin + cout)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile_rows, w, cout),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), bf16),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )(*args)


def bottleneck_reference(x, w1, b1, w2, b2, w3, b3, wd=None, bd=None):
    """Pure-jnp oracle with the kernel's exact op chain and dtypes
    (bf16 operands, f32 accumulation) — used by tests/test_fused_block.py
    to pin the kernel bit-for-bit shape-for-shape."""
    bf16 = jnp.bfloat16
    f32 = jnp.float32
    x = x.astype(bf16)
    y = jax.lax.conv_general_dilated(
        x, w1.astype(bf16)[None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=f32)
    y = jnp.maximum(y + b1.astype(f32), 0.0).astype(bf16)
    z = jax.lax.conv_general_dilated(
        y, w2.astype(bf16), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=f32)
    z = jnp.maximum(z + b2.astype(f32), 0.0).astype(bf16)
    o = jax.lax.conv_general_dilated(
        z, w3.astype(bf16)[None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=f32) + b3.astype(f32)
    if wd is not None:
        res = jax.lax.conv_general_dilated(
            x, wd.astype(bf16)[None, None], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=f32) + bd.astype(f32)
    else:
        res = x.astype(f32)
    return jnp.maximum(o + res, 0.0).astype(bf16)
