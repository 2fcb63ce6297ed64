"""Fused Pallas stem: 7x7/2 conv (Cin=3) + bias + relu + 3x3/2 maxpool.

Why (docs/perf_notes.md round-4 stem probe,
scripts/probes/_stem_probe.py): the stem is the forward's worst section
per FLOP — XLA runs the 7x7/2 conv at 3% MFU (4.2 ms at batch 16) and
the 3x3/2 reduce_window maxpool ~8x over its traffic bound (2.7 ms),
4.7 ms of the 60 ms forward. Both ops are tiny by FLOPs and bytes
(41 MB in, 54 MB out): this kernel does the whole stem in one HBM pass
with all intermediates in VMEM.

Input layout — DOUBLE space-to-depth ``[B, H/2, W/4, 24]``:
``xd[r, s4, par*12 + s2dch] = y[r, 2*s4 + par, s2dch]`` where
``y[r, s, (a, b, c)] = x[2r+a, 2s+b, c]`` is the 2x2 space-to-depth
image. Two reasons, both Mosaic structural:

* In the s2d domain the stride-2 conv becomes a 4x4/1 conv over
  unit-stride slices (see the tap algebra in ``layers.s2d_conv7x7s2``);
  the raw layout would need stride-2 lane gathers.
* Folding the remaining output-column parity into LANES removes every
  stride-2 access the in-kernel 3x3/2 maxpool would otherwise make on
  the sublane (width) dim — v1 of this kernel used
  ``lax.slice(..., strides=(2, 2, 1))`` there and Mosaic rejected it
  ('vector.extract_strided_slice').

The even/odd output-column parities are computed by two separate
per-parity weight matrices (``_parity_weights``) as accumulated small
matmuls over the 12 (row, pair-column) taps — v2's single [*, 80C] x
[80C, 2Co] matmul and its offset-64 lane splits crashed Mosaic's compile
HELPER (exit 1, scripts/probes/_stem_compile_probe.py); this formulation
uses only constructs ops/fused_block proved on this runtime (unit-stride
slices, sublane/leading concats, elementwise max). The width-pool then
needs no strided or lane access at all: ``max(yo[s-1], ye[s], yo[s])``.

The conv kernel is pre-transformed on the fly (same tap mapping as
``layers.s2d_conv7x7s2``; out-of-range taps zero). BatchNorm must
already be folded into (kernel, bias) — serving-only, like
ops/fused_block (reference stem: model/smap.py:80-92).

Grid: (B, H_pool/TILE_P). A pool band of TILE_P rows needs 2*TILE_P+1
conv rows, which need 2*TILE_P+4 s2d rows at offset 16t-3; they arrive
as one 2*TILE_P-row body block plus 4-row edge-clamped halo blocks on
each side (zero-masked at the image edges — SAME zero padding for both
conv and the torch-semantics -inf pool padding; relu output is >= 0, so
zero padding IS -inf padding for the pool).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Pool-output rows per grid program (pool H = 128 at the deployment
# shape; 8 -> 16 programs x batch).
TILE_P = 8


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 4C] with channel order (a, b, c)."""
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def double_space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/4, 8C], channel (par, a, b, c): lane
    ``par*4C + s2dch`` holds s2d column ``2*s4 + par``'s channel s2dch."""
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w // 4, 2, 2, c)
    # (B, r, a, s4, par, bcol, c) -> (B, r, s4, par, a, bcol, c)
    y = y.transpose(0, 1, 3, 4, 2, 5, 6)
    return y.reshape(b, h // 2, w // 4, 8 * c)


def _s2d_kernel_transform(k7: jnp.ndarray) -> jnp.ndarray:
    """[7, 7, C, Co] stride-2 pad-3 kernel -> [4, 4, 4C, Co] s2d kernel."""
    kh, kw, c, co = k7.shape
    kp = jnp.zeros((kh + 1, kw + 1, c, co), k7.dtype).at[1:, 1:].set(k7)
    k2 = kp.reshape(4, 2, 4, 2, c, co).transpose(0, 2, 1, 3, 4, 5)
    return k2.reshape(4, 4, 4 * c, co)


def _parity_weights(k7: jnp.ndarray):
    """[7, 7, C, Co] -> ([80C, Co] even, [80C, Co] odd) column weights.

    Output column j = 2*s4 + par of the s2d conv reads s2d columns
    j-2+q (q = 0..3) = pair columns {s4-1, s4, s4+1} at parities derived
    from (j-2+q) mod 2. Row blocks are ordered to match the kernel's tap
    enumeration: for each row tap p (0..3), pair-column taps pc = 0, 1
    carry all 8C lanes (both parities) and pc = 2 carries only parity 0
    (parity 1 there is used by neither output parity).
    """
    k2 = _s2d_kernel_transform(k7)            # [4, 4, 4C, Co]
    c4, co = k2.shape[2], k2.shape[3]
    z = jnp.zeros((c4, co), k2.dtype)
    we, wo = [], []
    for p in range(4):
        we.extend([k2[p, 0], k2[p, 1],    # pc0: par0, par1
                   k2[p, 2], k2[p, 3],    # pc1: par0, par1
                   z])                    # pc2: par0
        wo.extend([z, k2[p, 0],
                   k2[p, 1], k2[p, 2],
                   k2[p, 3]])
    return jnp.concatenate(we, axis=0), jnp.concatenate(wo, axis=0)


def _kernel(top_ref, body_ref, bot_ref, we_ref, wo_ref, b_ref, out_ref, *,
            tile_p: int, stage: int, stride_rowpool: bool):
    """One (image, pool band) stem step.

    top/bot: [1, 4, W4, C8] halo double-s2d rows (edge-clamped), body:
    [1, 2*tile_p, W4, C8], we/wo: [80C, Co] per-parity weights (C8 =
    8C), b: [1, Co] f32. out: [1, tile_p, W4, Co].

    Row algebra (pool band start P = t*tile_p): conv rows needed are
    2P-1 .. 2P+2*tile_p-1 (pool pad 1), conv row i reads s2d rows
    i-2 .. i+1 (conv pad (2, 1)), so s2d rows 2P-3 .. 2P+2*tile_p.
    Blocks supply rows 2P-4 .. 2P+2*tile_p+3 (block-aligned), with the
    out-of-image rows zero-masked here.

    stage: compile-bisect switch — 0 conv only, 1 + width pool, 2 full.
    stride_rowpool: row-pool pairing by leading-dim stride-2 lax.slice
    instead of leading-dim reshape (two Mosaic formulations).
    """
    t = pl.program_id(1)
    last = pl.num_programs(1) - 1
    body = body_ref[0]                            # [2*tile_p, W4, C8]
    w4, c8 = body.shape[1], body.shape[2]
    c4 = c8 // 2
    co = we_ref.shape[-1]
    f32 = jnp.float32
    n_conv = 2 * tile_p + 1

    # Assemble s2d rows 2P-4 .. 2P+2*tile_p+3 and zero the out-of-image
    # halo rows (t==0: rows <0; t==last: rows >= H2).
    ztop = jnp.zeros_like(top_ref[0])
    zbot = jnp.zeros_like(bot_ref[0])
    xs = jnp.concatenate([
        jnp.where(t == 0, ztop, top_ref[0]), body,
        jnp.where(t == last, zbot, bot_ref[0])], axis=0)

    # SAME width padding: one zero pair-column each side (pair column -1
    # for the pc=0 taps of output s4=0; pair column W4 for the pc=2 taps
    # of output s4=W4-1).
    zcol = jnp.zeros((xs.shape[0], 1, c8), xs.dtype)
    xs = jnp.concatenate([zcol, xs, zcol], axis=1)   # [rows, W4+2, C8]

    # Conv as 12 accumulated tap matmuls, one per (row tap p,
    # pair-column tap pc). Conv row i (global 2P-1+li, local
    # li = 0..n_conv-1) reads s2d global rows i-2+p = 2P-3+li+p -> xs
    # row li+p+1 (xs row 0 is global 2P-4). Output pair column s4 reads
    # padded pair columns s4+pc. pc=2 contributes only parity-0 lanes
    # (see _parity_weights). Unit-stride slices only; no lane concats or
    # lane splits (both crashed the Mosaic compile helper —
    # scripts/probes/_stem_compile_probe.py).
    ye = jnp.zeros((n_conv * w4, co), f32)
    yo = jnp.zeros((n_conv * w4, co), f32)
    r0 = 0
    for p in range(4):
        rows = xs[p + 1:p + 1 + n_conv]
        for pc in range(3):
            width = c4 if pc == 2 else c8
            tap = rows[:, pc:pc + w4, :width].reshape(n_conv * w4, width)
            ye += jnp.dot(tap, we_ref[r0:r0 + width],
                          preferred_element_type=f32)
            yo += jnp.dot(tap, wo_ref[r0:r0 + width],
                          preferred_element_type=f32)
            r0 += width
    ye = jnp.maximum(ye + b_ref[:], 0.0).reshape(n_conv, w4, co)
    yo = jnp.maximum(yo + b_ref[:], 0.0).reshape(n_conv, w4, co)
    if stage == 0:       # compile-bisect: conv only
        out_ref[0] = ye[1:1 + tile_p].astype(out_ref.dtype)
        return

    # Local conv row 0 is global conv row 2P-1: at t==0 that's the pool's
    # top PAD row (-inf in reduce_window semantics), not a conv output —
    # zero it (all real relu outputs are >= 0, so 0 acts as -inf).
    zrow = jnp.zeros((1, w4, co), f32)
    ye = jnp.concatenate([jnp.where(t == 0, zrow, ye[:1]), ye[1:]], axis=0)
    yo = jnp.concatenate([jnp.where(t == 0, zrow, yo[:1]), yo[1:]], axis=0)

    # Width pool: pool column s covers conv columns 2s-1, 2s, 2s+1 =
    # odd[s-1], even[s], odd[s]. All unit-stride; column -1 is pool
    # padding (zero >= -inf semantics post-relu).
    zc = jnp.zeros((n_conv, 1, co), f32)
    yo_shift = jnp.concatenate([zc, yo[:, :w4 - 1]], axis=1)
    m = jnp.maximum(jnp.maximum(yo_shift, ye), yo)   # [n_conv, W4, Co]
    if stage == 1:       # compile-bisect: conv + width pool only
        out_ref[0] = m[1:1 + tile_p].astype(out_ref.dtype)
        return

    # Row pool: out[r] = max(m[2r], m[2r+1], m[2r+2]) — no strided
    # vector-dim access; the stride-2 pairing happens on the leading
    # (non-vector) dim, by reshape or by lax.slice.
    zr = jnp.zeros((1, w4, co), f32)
    if stride_rowpool:
        m2 = jnp.concatenate([m, zr], axis=0)        # [2*tile_p+2, ...]
        a0 = jax.lax.slice(m2, (0, 0, 0), (2 * tile_p, w4, co), (2, 1, 1))
        a1 = jax.lax.slice(m2, (1, 0, 0), (2 * tile_p + 1, w4, co),
                           (2, 1, 1))
        a2 = jax.lax.slice(m2, (2, 0, 0), (2 * tile_p + 2, w4, co),
                           (2, 1, 1))
        out = jnp.maximum(jnp.maximum(a0, a1), a2)
    else:
        a = m[:2 * tile_p].reshape(tile_p, 2, w4, co)
        b2 = jnp.concatenate([m[2:], zr], axis=0).reshape(tile_p, 2, w4, co)
        out = jnp.maximum(jnp.maximum(a[:, 0], a[:, 1]), b2[:, 0])
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_p", "interpret",
                                              "stage", "stride_rowpool"))
def fused_stem(x_d2: jnp.ndarray, kernel7: jnp.ndarray, bias: jnp.ndarray,
               tile_p: int = TILE_P, interpret: bool = False,
               stage: int = 2, stride_rowpool: bool = False) -> jnp.ndarray:
    """maxpool3x3/2(relu(conv7x7/2(x) + bias)) from the double-s2d image.

    Args:
      x_d2: [B, H/2, W/4, 8C] double space-to-depth image
        (``double_space_to_depth(x)``).
      kernel7: [7, 7, C, Co] the ORIGINAL stride-2 conv kernel (BN
        already folded for serving); transformed to the parity-split s2d
        domain here.
      bias: [Co] f32.
      tile_p: pool-output rows per program; must divide H/4.
      stage: compile-bisect switch — 0 conv only, 1 + width pool,
        2 full (production). Stages <2 return dummy-shaped outputs.
      stride_rowpool: A/B the row-pool pairing construct (leading-dim
        lax.slice stride 2 vs leading-dim reshape).

    Returns [B, H/4, W/4, Co] bf16.
    """
    b, h2, w4, c8 = x_d2.shape
    if tile_p not in (4, 8):
        raise ValueError("tile_p must be 4 or 8 (4-row halo blocks)")
    co = kernel7.shape[-1]
    if (h2 // 2) % tile_p or h2 % 4:
        raise ValueError(f"pool rows {h2 // 2} not divisible by {tile_p}")
    grid = (b, h2 // 2 // tile_p)
    bf16 = jnp.bfloat16
    we, wo = _parity_weights(kernel7.astype(bf16))   # [80C, Co] each
    x_d2 = x_d2.astype(bf16)

    def halo(row_of):
        return pl.BlockSpec(
            (1, 4, w4, c8),
            lambda bi, ti: (bi, row_of(ti), 0, 0),
            memory_space=pltpu.VMEM)

    tp2 = tile_p // 2   # 4-row halo blocks per band start
    last_blk = h2 // 4 - 1
    in_specs = [
        # s2d rows 2P-4 .. 2P-1 (P = t*tile_p; 4-row block idx tp2*t-1):
        halo(lambda ti: jnp.maximum(tp2 * ti - 1, 0)),
        pl.BlockSpec((1, 2 * tile_p, w4, c8),
                     lambda bi, ti: (bi, ti, 0, 0),
                     memory_space=pltpu.VMEM),
        # s2d rows 2P+2*tile_p .. +3:
        halo(lambda ti: jnp.minimum(tp2 * (ti + 1), last_blk)),
        pl.BlockSpec(we.shape, lambda bi, ti: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(wo.shape, lambda bi, ti: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, co), lambda bi, ti: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    flops = 2 * b * (h2 + h2 // 2 // tile_p) * w4 * we.shape[0] * 2 * co
    return pl.pallas_call(
        functools.partial(_kernel, tile_p=tile_p, stage=stage,
                          stride_rowpool=stride_rowpool),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile_p, w4, co),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h2 // 2, w4, co), bf16),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * b * h2 * w4 * (c8 + co // 2),
            transcendentals=0),
        interpret=interpret,
    )(x_d2, x_d2, x_d2, we, wo,
      bias.reshape(1, co).astype(jnp.float32))


def stem_reference(x: jnp.ndarray, kernel7: jnp.ndarray,
                   bias: jnp.ndarray) -> jnp.ndarray:
    """Pure-XLA oracle with the kernel's op chain and dtypes (bf16
    operands, f32 conv accumulation) for tests/test_fused_stem.py."""
    bf16 = jnp.bfloat16
    y = jax.lax.conv_general_dilated(
        x.astype(bf16), kernel7.astype(bf16), (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y + bias.astype(jnp.float32), 0.0)
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    return y.astype(bf16)
