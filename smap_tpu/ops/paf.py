"""PAF line-integral scoring: build the [num_limbs, K, K] pair-score table.

TPU-native (pure XLA, fixed-shape) equivalent of the reference CUDA kernel
(``extensions/gpu/bodyPartConnectorBase.cu:11-150`` in zju3dv/SMAP):

* For every (limb, peakA, peakB) triplet, sample up to 25 points along the
  A->B segment, dot the PAF vector field with the unit direction, and keep
  samples above ``inter_threshold``.
* The reference adapts the sample count to the segment length
  (5..25 = clamp(round(sqrt(5*max(|dx|,|dy|))))); we keep that *exactly* by
  always computing 25 samples and masking ``lm >= n_points`` — same values,
  static shapes.
* score = mean of passing samples if >=95% pass; else a small default if the
  peaks are nearly coincident (dist < sqrt(H*W)/150); else -1
  (bodyPartConnectorBase.cu:47-62, thresholds :172-174).

The whole table is one fused sampling pass + VPU reduction; vmappable over
batch.

Sampling implementations (``impl``):

* ``"gather"`` — direct scalar gather from the [L, HW] maps. Fast on CPU;
  on the target TPU runtime XLA lowers it to ~40 ns/element serialized
  loads (~300 ms/batch-16 measured — the single hottest op in the whole
  inference pipeline).
* ``"onehot"`` — re-expresses the lookup as one-hot matmuls on the MXU:
  rows = onehot(py) @ map (batched over limbs), then a masked reduction
  with onehot(px). Because every one-hot row has exactly one nonzero,
  each matmul output element is a single product — no accumulation — so
  splitting the f32 map into three bf16 terms (hi/mid/lo) and summing the
  three bf16 matmuls reconstructs the f32 values exactly (~20 ms/batch-16
  on the same hardware).
* ``"auto"`` — ``"onehot"`` on TPU-like backends, ``"gather"`` elsewhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from smap_tpu.ops.nms import Peaks


def _sample_gather(paf_x: jnp.ndarray, paf_y: jnp.ndarray,
                   px: jnp.ndarray, py: jnp.ndarray, w: int):
    """Scalar-gather map sampling. paf_*: [L, HW]; px/py: [L, K, K, S]."""
    L = paf_x.shape[0]
    K, S = px.shape[1], px.shape[3]
    flat_idx = (py * w + px).reshape(L, -1)
    take = jax.vmap(lambda m, i: jnp.take(m, i, axis=0))
    mx = take(paf_x, flat_idx).reshape(L, K, K, S)
    my = take(paf_y, flat_idx).reshape(L, K, K, S)
    return mx, my


def _split_bf16(m: jnp.ndarray, parts: int):
    """Split f32 into ``parts`` bf16 terms whose f32 sum reconstructs it
    to 8*parts mantissa bits (3 parts >= f32's 24: exact)."""
    terms = []
    r = m
    for _ in range(parts - 1):
        t = r.astype(jnp.bfloat16)
        terms.append(t)
        r = r - t.astype(jnp.float32)
    terms.append(r.astype(jnp.bfloat16))
    return terms


def _sample_onehot(paf_x: jnp.ndarray, paf_y: jnp.ndarray,
                   px: jnp.ndarray, py: jnp.ndarray, h: int, w: int,
                   parts: int = 3):
    """MXU map sampling: map[py, px] == sum_w (onehot(py) @ map) * onehot(px).

    Exact f32 selection at parts=3: the one-hot operand is exact in bf16
    and each output element is one product, so the bf16-part map split
    sums back to the f32 value. The parts are stacked along the contracted
    H axis and the x/y maps along the output W axis, so each sample
    position costs ONE [K^2, parts*H] @ [parts*H, 2W] matmul per limb
    (measured ~40% faster than separate small matmuls). Scanned over the
    S sample positions to bound the transient one-hot/row tensors.
    """
    L = paf_x.shape[0]
    K, S = px.shape[1], px.shape[3]
    P = K * K
    m3 = _stack_parts(paf_x, paf_y, h, w, parts)           # [L, pH, 2W]
    pys = py.reshape(L, P, S)
    pxs = px.reshape(L, P, S)

    def step(_, s):
        oy = jax.nn.one_hot(pys[:, :, s], h, dtype=jnp.bfloat16)  # [L,P,H]
        oyp = jnp.concatenate([oy] * parts, axis=-1)              # [L,P,pH]
        rows = jnp.einsum("lph,lhw->lpw", oyp, m3,
                          preferred_element_type=jnp.float32)     # [L,P,2W]
        ox = jax.nn.one_hot(pxs[:, :, s], w, dtype=jnp.float32)   # [L,P,W]
        return _, (jnp.sum(rows[..., :w] * ox, axis=-1),
                   jnp.sum(rows[..., w:] * ox, axis=-1))

    _, (mxs, mys) = jax.lax.scan(step, 0, jnp.arange(S))
    mx = jnp.moveaxis(mxs, 0, -1).reshape(L, K, K, S)
    my = jnp.moveaxis(mys, 0, -1).reshape(L, K, K, S)
    return mx, my


def _stack_parts(paf_x: jnp.ndarray, paf_y: jnp.ndarray, h: int, w: int,
                 parts: int) -> jnp.ndarray:
    """[L, parts*H, 2W] bf16: bf16 split terms on contracted-H, x|y maps
    on the output W axis."""
    xs = _split_bf16(paf_x.reshape(-1, h, w), parts)
    ys = _split_bf16(paf_y.reshape(-1, h, w), parts)
    return jnp.concatenate(
        [jnp.concatenate([xp, yp], axis=-1) for xp, yp in zip(xs, ys)],
        axis=1)


def _sample_pallas(paf_x: jnp.ndarray, paf_y: jnp.ndarray,
                   px: jnp.ndarray, py: jnp.ndarray, h: int, w: int,
                   parts: int = 3):
    """Fused-VMEM variant of :func:`_sample_onehot` (same math):
    the one-hot operands and the [P, 2W] matmul rows never reach HBM.
    See smap_tpu.ops.pallas_kernels.paf_sample."""
    from smap_tpu.ops.pallas_kernels import paf_sample

    L = paf_x.shape[0]
    K, S = px.shape[1], px.shape[3]
    m3t = jnp.swapaxes(_stack_parts(paf_x, paf_y, h, w, parts), 1, 2)
    # Flatten (pair, sample) straight into the lane dimension.
    vx, vy = paf_sample(m3t, px.reshape(L, -1), py.reshape(L, -1),
                        h=h, w=w, parts=parts)
    return vx.reshape(L, K, K, S), vy.reshape(L, K, K, S)


def _resolve_impl(impl: str) -> str:
    if impl != "auto":
        return impl
    # The scalar-gather path serializes on TPU backends, so TPU gets the
    # fused Mosaic kernel. Every other backend (CPU, GPU, ...) defaults to
    # the plain gather: gathers are fast there, and the one-hot matmul
    # formulation pays ~H*W extra FLOPs per sample. "onehot" remains an
    # explicit opt-in for TPU-like backends without Mosaic support.
    return "pallas" if jax.default_backend() == "tpu" else "gather"


def paf_scores(pafs: jnp.ndarray, peaks: Peaks, limb_pairs: jnp.ndarray, *,
               inter_threshold: float = 0.05,
               inter_min_above: float = 0.95,
               default_threshold: float = 0.1,
               num_samples: int = 25, impl: str = "auto",
               parts: int = 3) -> jnp.ndarray:
    """Compute PAF pair scores.

    Args:
      pafs: [2*L, H, W] PAF field (x-channel, y-channel per limb, already
        divided by 127 as in the reference test driver, test.py:112).
      peaks: Peaks with xy [J, K, 2], score [J, K], count [J].
      limb_pairs: [L, 2] int array of (src_joint, dst_joint).

    Returns:
      [L, K, K] float32 score table; invalid pairs hold -1.
    """
    L = limb_pairs.shape[0]
    K = peaks.xy.shape[1]
    _, h, w = pafs.shape
    close_threshold = (float(h) * float(w)) ** 0.5 / 150.0

    src_xy = peaks.xy[limb_pairs[:, 0]]        # [L, K, 2]
    dst_xy = peaks.xy[limb_pairs[:, 1]]        # [L, K, 2]
    n_src = peaks.count[limb_pairs[:, 0]]      # [L]
    n_dst = peaks.count[limb_pairs[:, 1]]

    a = src_xy[:, :, None, :]                  # [L, K, 1, 2]
    b = dst_xy[:, None, :, :]                  # [L, 1, K, 2]
    vec = b - a                                # [L, K, K, 2]
    norm = jnp.sqrt(jnp.sum(vec * vec, axis=-1))          # [L, K, K]
    vmax = jnp.maximum(jnp.abs(vec[..., 0]), jnp.abs(vec[..., 1]))
    n_pts = jnp.clip(jnp.floor(jnp.sqrt(5.0 * vmax) + 0.5), 5, num_samples)
    unit = vec / jnp.maximum(norm, 1e-12)[..., None]

    # Sample positions: x_lm = round(ax + lm * dx / n_pts), clamped above.
    lm = jnp.arange(num_samples, dtype=jnp.float32)       # [S]
    step = vec[..., None, :] / n_pts[..., None, None]     # [L, K, K, 1, 2]
    pos = a[..., None, :] + lm[None, None, None, :, None] * step
    # intRoundGPU(x) = int(x + 0.5); min-clamp to the last row/col
    # (bodyPartConnectorBase.cu:36-37).
    px = jnp.minimum(jnp.floor(pos[..., 0] + 0.5), w - 1).astype(jnp.int32)
    py = jnp.minimum(jnp.floor(pos[..., 1] + 0.5), h - 1).astype(jnp.int32)
    px = jnp.maximum(px, 0)
    py = jnp.maximum(py, 0)

    paf_x = pafs[0::2].reshape(L, h * w)                   # [L, HW]
    paf_y = pafs[1::2].reshape(L, h * w)
    resolved = _resolve_impl(impl)
    if resolved == "pallas":
        mx, my = _sample_pallas(paf_x, paf_y, px, py, h, w, parts)
    elif resolved == "onehot":
        mx, my = _sample_onehot(paf_x, paf_y, px, py, h, w, parts)
    else:
        mx, my = _sample_gather(paf_x, paf_y, px, py, w)

    sample_score = unit[..., 0:1] * mx + unit[..., 1:2] * my  # [L,K,K,S]
    active = lm[None, None, None, :] < n_pts[..., None]
    passing = (sample_score > inter_threshold) & active
    cnt = jnp.sum(passing, axis=-1).astype(jnp.float32)
    ssum = jnp.sum(jnp.where(passing, sample_score, 0.0), axis=-1)

    mean_score = ssum / jnp.maximum(cnt, 1.0)
    enough = cnt / n_pts > inter_min_above
    close = norm < close_threshold
    score = jnp.where(enough, mean_score,
                      jnp.where(close, default_threshold + 1e-6, -1.0))
    # Coincident peaks never connect (bodyPartConnectorBase.cu:23).
    score = jnp.where(norm > 1e-6, score, -1.0)

    # Invalid peak slots -> -1 (bodyPartConnectorBase.cu:134,148).
    ia = jnp.arange(K)
    valid = ((ia[None, :, None] < n_src[:, None, None]) &
             (ia[None, None, :] < n_dst[:, None, None]))
    return jnp.where(valid, score, -1.0).astype(jnp.float32)
