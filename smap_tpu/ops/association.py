"""Depth-aware greedy skeleton association.

TPU-native re-expression of the reference's sequential CPU loop
(``extensions/association.cpp:123-233`` in zju3dv/SMAP). The algorithm —
bit-for-bit semantics, fixed shapes:

1. Every pelvis (root) peak seeds a person. Persons are sorted by predicted
   root depth, nearest first ("ordinal prior", association.cpp:144-146); the
   root-depth value is read from the root-depth map at the truncated peak
   coordinates (association.cpp:140).
2. Limbs are processed in a fixed order with two special cases
   (association.cpp:164-178): limb order = [1, 0, 2, 3, ... 13]; and for
   root=pelvis, limb 1 (neck->pelvis) runs *flipped* (src=pelvis, dst=neck,
   score table transposed).
3. For each limb, persons pick greedily (nearest-first) the unused dst peak
   maximizing: paf_score + min(1.2*bone_len/root_depth/limb_dist/4 - 1, 0)
   (the depth-adaptive bone-length prior, association.cpp:198-213); a pick
   requires score > 0 (association.cpp:220).

The per-limb person loop is a ``lax.scan`` whose carry holds the assembled
skeletons, the per-joint peak remap, and the used-mask; the limb loop is
unrolled (14 static iterations). vmappable over the batch axis.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from smap_tpu.config import BONE_LENGTHS, NUM_JOINTS, NUM_LIMBS, PAF_VECTOR
from smap_tpu.ops.nms import Peaks


class Bodies(NamedTuple):
    """Assembled 2D skeletons at output-map resolution.

    joints: [P, J, 4] = (x, y, 0, score); score==0 marks missing joints.
    count: [] number of persons (root peaks).
    root_depth: [P] normalized root depth per person (sorted ascending).
    """

    joints: jnp.ndarray
    count: jnp.ndarray
    root_depth: jnp.ndarray


def _limb_order(num_limbs: int) -> Tuple[int, ...]:
    """Processing order: [1, 0, 2, 3, ...] (association.cpp:168-170)."""
    order = list(range(num_limbs))
    order[0], order[1] = 1, 0
    return tuple(order)


def _select_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table[idx] for a traced index vector without a gather.

    Scalar gathers serialize at ~40 ns/element on the target TPU backend
    (docs/perf_notes.md); a one-hot masked sum is a dense VPU reduction and
    exact (each output element has a single nonzero contribution).

    Args:
      table: [K, ...] source rows.
      idx: [P] int32 row indices (must be in range).

    Returns:
      [P, ...] selected rows.
    """
    K = table.shape[0]
    onehot = idx[:, None] == jnp.arange(K)[None, :]            # [P, K]
    extra = (1,) * (table.ndim - 1)
    mask = onehot.reshape(onehot.shape + extra)                # [P, K, 1...]
    return jnp.sum(jnp.where(mask, table[None], 0), axis=1)


def _resolve_impl(impl: str) -> str:
    if impl != "auto":
        return impl
    # The lax.scan greedy pays ~50 us of sequential-op overhead per tiny
    # step on TPU backends (14 limbs x K steps ~ 28 ms/batch-16); the
    # pallas kernel runs the same loop in VMEM. Everything else keeps the
    # scan (the Mosaic kernel is TPU-only; interpret mode would be far
    # slower).
    return "pallas" if jax.default_backend() == "tpu" else "scan"


def associate(peaks: Peaks, paf_score_table: jnp.ndarray,
              root_depth_map: jnp.ndarray, *, root_idx: int = 2,
              dist_flag: bool = True, ds_scale: float = 4.0,
              bone_factor: float = 1.2, impl: str = "auto") -> Bodies:
    """Greedy depth-aware association.

    Args:
      peaks: Peaks pytree, xy [J, K, 2], score [J, K], count [J].
      paf_score_table: [L, K, K] from smap_tpu.ops.paf.paf_scores.
      root_depth_map: [H, W] normalized root-depth map.
      impl: greedy-loop implementation, "auto" | "scan" | "pallas"
        (see _resolve_impl).

    Returns:
      Bodies with capacity K; rows >= count are all-zero.
    """
    num_joints = peaks.xy.shape[0]
    K = peaks.xy.shape[1]
    limb_pairs = jnp.asarray(PAF_VECTOR, jnp.int32)
    bone_lengths = jnp.asarray(BONE_LENGTHS, jnp.float32)
    h, w = root_depth_map.shape

    person_num = peaks.count[root_idx]
    person_valid = jnp.arange(K) < person_num

    # Root depth per root peak, truncated-int lookup (association.cpp:140).
    rx = jnp.clip(peaks.xy[root_idx, :, 0].astype(jnp.int32), 0, w - 1)
    ry = jnp.clip(peaks.xy[root_idx, :, 1].astype(jnp.int32), 0, h - 1)
    root_depth = root_depth_map[ry, rx]

    # Ascending depth sort over valid persons (invalid pushed to the end).
    sort_key = jnp.where(person_valid, root_depth, jnp.inf)
    sort_index = jnp.argsort(sort_key, stable=True)
    sorted_depth = sort_key[sort_index]

    # remap[j, p] = peak index of joint j for person p.
    remap = jnp.tile(jnp.arange(K, dtype=jnp.int32)[None, :], (num_joints, 1))
    remap = remap.at[root_idx].set(sort_index.astype(jnp.int32))

    # Seed persons with their root peak (association.cpp:156-162).
    bodies = jnp.zeros((K, num_joints, 4), jnp.float32)
    root_xy = peaks.xy[root_idx][sort_index]
    root_sc = peaks.score[root_idx][sort_index]
    bodies = bodies.at[:, root_idx, 0].set(
        jnp.where(person_valid, root_xy[:, 0], 0.0))
    bodies = bodies.at[:, root_idx, 1].set(
        jnp.where(person_valid, root_xy[:, 1], 0.0))
    bodies = bodies.at[:, root_idx, 3].set(
        jnp.where(person_valid, root_sc, 0.0))

    for limb in _limb_order(NUM_LIMBS):
        flip = root_idx == 2 and limb == 1
        if flip:
            src_joint = int(PAF_VECTOR[limb][1])
            dst_joint = int(PAF_VECTOR[limb][0])
        else:
            src_joint = int(PAF_VECTOR[limb][0])
            dst_joint = int(PAF_VECTOR[limb][1])

        dst_size = peaks.count[dst_joint]
        dst_xy = peaks.xy[dst_joint]           # [K, 2]
        dst_score = peaks.score[dst_joint]
        table = paf_score_table[limb]          # [K, K]
        if flip:
            table = table.T                    # score[src_peak, dst_peak]
        remap_src = remap[src_joint]           # frozen before this limb
        dst_slot_valid = jnp.arange(K) < dst_size

        # Everything except the used-mask is independent of the greedy
        # order, so precompute the full [K, K] adjusted score matrix and
        # keep the sequential scan's carry down to one boolean vector (the
        # [K,15,4] bodies carry made each of the 14*K tiny steps pay a
        # dynamic-update-slice of the whole table).
        src = bodies[:, src_joint]             # [K, 4] frozen this limb
        src_ok = (src[:, 3] >= 1e-5) & person_valid
        scores_all = _select_rows(table, remap_src)   # [K, K] person rows
        if dist_flag:
            dx = src[:, 0:1] - dst_xy[None, :, 0]
            dy = src[:, 1:2] - dst_xy[None, :, 1]
            limb_dist = jnp.sqrt(dx * dx + dy * dy)          # [K, K]
            bone_dist = (bone_factor * bone_lengths[limb]
                         / sorted_depth)[:, None]            # [K, 1]
            penalty = jnp.minimum(bone_dist / limb_dist / ds_scale - 1.0,
                                  0.0)
            scores_all = jnp.where(scores_all > 0, scores_all + penalty,
                                   scores_all)
        scores_all = jnp.where(dst_slot_valid[None, :], scores_all, -jnp.inf)

        # src_ok rows never take (their scores stay <= 0 only if the table
        # says so), so mask them to -inf up front: the reference skips
        # persons whose src joint is missing (association.cpp:186-188).
        scores_all = jnp.where(src_ok[:, None], scores_all, -jnp.inf)

        if _resolve_impl(impl) == "pallas":
            from smap_tpu.ops.pallas_kernels import associate_limb

            assign = associate_limb(scores_all, dst_slot_valid)
            take = (assign >= 0) & (dst_size > 0)
            max_idx = jnp.clip(assign, 0, K - 1)
        else:
            def body(used, scores_k1):
                scores = jnp.where(used, -jnp.inf, scores_k1)
                # Reference keeps max only when score > maxScore with
                # maxScore starting at 0 -> winner needs score strictly > 0
                # (association.cpp:215-220). argmax picks the first
                # maximum, matching the strict-greater scan order.
                max_idx = jnp.argmax(scores)
                take = scores[max_idx] > 0.0
                used = used | (jnp.arange(K) == max_idx) & take
                return used, (max_idx, take)

            used0 = jnp.zeros((K,), bool)
            _, (max_idx, take) = jax.lax.scan(body, used0, scores_all)
            take = take & (dst_size > 0)

        picked = _select_rows(
            jnp.concatenate([dst_xy, dst_score[:, None]], axis=-1), max_idx)
        new_joints = jnp.stack(
            [picked[:, 0], picked[:, 1],
             jnp.zeros((K,), jnp.float32), picked[:, 2]], axis=-1)
        bodies = bodies.at[:, dst_joint].set(
            jnp.where(take[:, None], new_joints, bodies[:, dst_joint]))
        remap = remap.at[dst_joint].set(
            jnp.where(take, max_idx.astype(jnp.int32), remap[dst_joint]))

    return Bodies(joints=bodies, count=person_num,
                  root_depth=jnp.where(person_valid, sorted_depth, 0.0))
