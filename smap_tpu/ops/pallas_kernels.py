"""Pallas TPU kernels for post-processing hot spots.

Two kernels, both optional (config/post flag or call-site choice) with the
pure-XLA implementations in smap_tpu.ops as the reference semantics:

* ``nms_fields``: one fused VMEM pass producing, per heatmap channel, the
  strict 3x3 local-max mask and the three 7x7 box-filter fields
  (sum s, sum s*x, sum s*y over positive scores) used for sub-pixel peak
  refinement — the work of the reference's two CUDA kernels
  (extensions/gpu/nmsBase.cu:11-135) without the intermediate HBM
  round-trips.
* ``associate_limb``: the per-limb greedy masked-argmax over the
  [K, K] PAF score table with the depth-adaptive bone-length prior
  (extensions/association.cpp:164-230), entirely in VMEM with a
  ``fori_loop`` over persons.

Gradients are not needed (inference-only path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Fused NMS fields
# ---------------------------------------------------------------------------

def _nms_fields_kernel(hm_ref, mask_ref, s_ref, sx_ref, sy_ref):
    hm = hm_ref[0]                                        # [H, W]
    h, w = hm.shape
    neg = jnp.float32(-jnp.inf)

    def shifted(dy, dx):
        padded = jnp.pad(hm, ((1, 1), (1, 1)), constant_values=neg)
        return jax.lax.dynamic_slice(padded, (1 + dy, 1 + dx), (h, w))

    mask = hm > 0.2
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            mask &= hm > shifted(dy, dx)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = ((row_ids > 0) & (row_ids < h - 1) &
                (col_ids > 0) & (col_ids < w - 1))
    mask_ref[0] = (mask & interior).astype(jnp.int32)

    s_pos = jnp.where(hm > 0, hm, 0.0)
    xs = col_ids.astype(jnp.float32)
    ys = row_ids.astype(jnp.float32)

    def box7(field):
        padded = jnp.pad(field, ((3, 3), (3, 3)))
        acc = jnp.zeros((h, w), jnp.float32)
        for dy in range(7):
            for dx in range(7):
                acc = acc + jax.lax.dynamic_slice(padded, (dy, dx), (h, w))
        return acc

    s_ref[0] = box7(s_pos)
    sx_ref[0] = box7(s_pos * xs)
    sy_ref[0] = box7(s_pos * ys)


def nms_fields(heatmaps: jnp.ndarray, *, threshold: float = 0.2,
               interpret: bool = False):
    """Fused local-max mask + refinement fields.

    Args:
      heatmaps: [C, H, W] float32.

    Returns:
      (mask int32 [C,H,W], sum_s, sum_sx, sum_sy float32 [C,H,W]).
    """
    del threshold  # fixed 0.2 inside the kernel (reference nmsThreshold)
    c, h, w = heatmaps.shape
    out = jax.ShapeDtypeStruct((c, h, w), jnp.float32)
    return pl.pallas_call(
        _nms_fields_kernel,
        grid=(c,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=tuple(
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM) for _ in range(4)),
        out_shape=(jax.ShapeDtypeStruct((c, h, w), jnp.int32),
                   out, out, out),
        interpret=interpret,
    )(heatmaps.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Greedy limb association
# ---------------------------------------------------------------------------

def _associate_limb_kernel(table_ref, src_xy_ref, src_score_ref,
                           dst_xy_ref, bone_dist_ref, valid_ref,
                           assign_ref, scratch_used):
    """One limb's greedy pass.

    Inputs (VMEM):
      table: [K, K] paf scores, already src-remapped per person row.
      src_xy: [K, 2] source joint positions per person.
      src_score: [K, 1] source joint scores.
      dst_xy: [K, 2] destination peak positions.
      bone_dist: [K, 1] per-person depth-adaptive bone prior.
      valid: [K, 2] columns: (person_valid, dst_slot_valid).
    Output:
      assign: [K, 1] chosen dst index per person (-1 = none).
    """
    K = table_ref.shape[0]
    scratch_used[:] = jnp.zeros_like(scratch_used)
    assign_ref[:] = jnp.full_like(assign_ref, -1)

    dst_x = dst_xy_ref[:, 0]
    dst_y = dst_xy_ref[:, 1]
    dst_valid = valid_ref[:, 1] > 0

    def body(k1, _):
        scores = table_ref[k1, :]
        sx = src_xy_ref[k1, 0]
        sy = src_xy_ref[k1, 1]
        dx = sx - dst_x
        dy = sy - dst_y
        limb_dist = jnp.sqrt(dx * dx + dy * dy)
        penalty = jnp.minimum(
            bone_dist_ref[k1, 0] / limb_dist / 4.0 - 1.0, 0.0)
        scores = jnp.where(scores > 0, scores + penalty, scores)
        used = scratch_used[0, :] > 0
        scores = jnp.where(used | ~dst_valid, -jnp.inf, scores)
        max_idx = jnp.argmax(scores)
        max_score = scores[max_idx]
        take = ((src_score_ref[k1, 0] >= 1e-5) & (valid_ref[k1, 0] > 0)
                & (max_score > 0.0))

        @pl.when(take)
        def _():
            assign_ref[k1, 0] = max_idx.astype(jnp.int32)
            col = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
            scratch_used[:] = jnp.where(col == max_idx, 1,
                                        scratch_used[:])
        return 0

    jax.lax.fori_loop(0, K, body, 0)


def associate_limb(table: jnp.ndarray, src_xy: jnp.ndarray,
                   src_score: jnp.ndarray, dst_xy: jnp.ndarray,
                   bone_dist: jnp.ndarray, person_valid: jnp.ndarray,
                   dst_slot_valid: jnp.ndarray, *,
                   interpret: bool = False) -> jnp.ndarray:
    """Greedy per-limb assignment; returns [K] dst index or -1."""
    K = table.shape[0]
    valid = jnp.stack([person_valid.astype(jnp.float32),
                       dst_slot_valid.astype(jnp.float32)], axis=1)
    out = pl.pallas_call(
        _associate_limb_kernel,
        out_shape=jax.ShapeDtypeStruct((K, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, K), jnp.int32)],
        interpret=interpret,
    )(table.astype(jnp.float32), src_xy.astype(jnp.float32),
      src_score.reshape(K, 1).astype(jnp.float32),
      dst_xy.astype(jnp.float32),
      bone_dist.reshape(K, 1).astype(jnp.float32), valid)
    return out[:, 0]
