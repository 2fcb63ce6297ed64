"""Prototype: exact parallel-greedy association (prefix-finalization rounds).

Semantics-equivalent to the sequential nearest-first greedy: each round,
every unfinalized person picks its argmax over currently-unused dst peaks;
the longest prefix of persons whose picks don't collide (with finalized
picks or with a smaller-index pick this round) is finalized. Availability
only shrinks, so a finalized prefix equals the sequential result.

Validated against smap_tpu.ops.association.associate on random cases, then
timed on TPU.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from smap_tpu.config import (BONE_LENGTHS, NUM_JOINTS, NUM_LIMBS, PAF_VECTOR,
                             PostProcessConfig)
from smap_tpu.ops.association import associate, Bodies, _limb_order
from smap_tpu.ops.nms import Peaks, extract_peaks
from smap_tpu.ops.paf import paf_scores


def greedy_assign_parallel(scores_all: jnp.ndarray, K: int):
    """Exact greedy assignment via prefix-finalization rounds.

    scores_all: [K, K] adjusted scores (row = person in greedy order),
      invalid entries already -inf. A person takes its argmax among unused
      columns iff that score > 0.

    Returns (max_idx [K] int32, take [K] bool).
    """
    idx = jnp.arange(K)

    def cond(state):
        _, _, finalized, _ = state
        return ~jnp.all(finalized)

    def body(state):
        assign, take, finalized, used = state
        avail = jnp.where(used[None, :], -jnp.inf, scores_all)
        picks = jnp.argmax(avail, axis=1)                     # [K]
        pick_score = jnp.take_along_axis(avail, picks[:, None],
                                         axis=1)[:, 0]
        wants = pick_score > 0.0                              # would take
        # No-take persons are conflict-neutral and final immediately.
        # For takers: first (lowest-index) unfinalized claimant of each
        # column wins; a later claimant of the same column blocks the
        # prefix at its position.
        claim = jnp.where(wants & ~finalized, picks, K)       # [K]
        onehot = claim[:, None] == jnp.arange(K)[None, :]     # [K, K]
        first_claim = jnp.argmax(onehot, axis=0)              # [K] first row
        any_claim = jnp.any(onehot, axis=0)
        dup = wants & ~finalized & (
            jnp.where(any_claim[claim.clip(0, K - 1)],
                      first_claim[claim.clip(0, K - 1)], idx) != idx)
        # prefix = persons before the first duplicate-claim conflict
        blocked = jnp.where(dup, idx, K)
        prefix_end = jnp.min(blocked)
        newly = ~finalized & (idx < prefix_end)
        assign = jnp.where(newly & wants, picks, assign)
        take = take | (newly & wants)
        used = used | jnp.any(
            jnp.where((newly & wants)[:, None], onehot, False), axis=0)
        finalized = finalized | newly
        return assign, take, finalized, used

    state = (jnp.full((K,), -1, jnp.int32), jnp.zeros((K,), bool),
             jnp.zeros((K,), bool), jnp.zeros((K,), bool))
    assign, take, _, _ = jax.lax.while_loop(cond, body, state)
    return assign, take


def associate_parallel(peaks, paf_score_table, root_depth_map, *,
                       root_idx=2, dist_flag=True, ds_scale=4.0,
                       bone_factor=1.2):
    """associate() with the scan replaced by greedy_assign_parallel."""
    num_joints = peaks.xy.shape[0]
    K = peaks.xy.shape[1]
    limb_pairs = jnp.asarray(PAF_VECTOR, jnp.int32)
    bone_lengths = jnp.asarray(BONE_LENGTHS, jnp.float32)
    h, w = root_depth_map.shape

    person_num = peaks.count[root_idx]
    person_valid = jnp.arange(K) < person_num
    rx = jnp.clip(peaks.xy[root_idx, :, 0].astype(jnp.int32), 0, w - 1)
    ry = jnp.clip(peaks.xy[root_idx, :, 1].astype(jnp.int32), 0, h - 1)
    root_depth = root_depth_map[ry, rx]
    sort_key = jnp.where(person_valid, root_depth, jnp.inf)
    sort_index = jnp.argsort(sort_key, stable=True)
    sorted_depth = sort_key[sort_index]

    remap = jnp.tile(jnp.arange(K, dtype=jnp.int32)[None, :],
                     (num_joints, 1))
    remap = remap.at[root_idx].set(sort_index.astype(jnp.int32))
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
        dst_xy = peaks.xy[dst_joint]
        dst_score = peaks.score[dst_joint]
        table = paf_score_table[limb]
        if flip:
            table = table.T
        remap_src = remap[src_joint]
        dst_slot_valid = jnp.arange(K) < dst_size

        src = bodies[:, src_joint]
        src_ok = (src[:, 3] >= 1e-5) & person_valid
        scores_all = table[remap_src]
        if dist_flag:
            dx = src[:, 0:1] - dst_xy[None, :, 0]
            dy = src[:, 1:2] - dst_xy[None, :, 1]
            limb_dist = jnp.sqrt(dx * dx + dy * dy)
            bone_dist = (bone_factor * bone_lengths[limb]
                         / sorted_depth)[:, None]
            penalty = jnp.minimum(bone_dist / limb_dist / ds_scale - 1.0,
                                  0.0)
            scores_all = jnp.where(scores_all > 0, scores_all + penalty,
                                   scores_all)
        scores_all = jnp.where(dst_slot_valid[None, :], scores_all,
                               -jnp.inf)
        scores_all = jnp.where(src_ok[:, None], scores_all, -jnp.inf)

        max_idx, take = greedy_assign_parallel(scores_all, K)
        take = take & (dst_size > 0)
        safe_idx = jnp.clip(max_idx, 0, K - 1)

        new_joints = jnp.stack(
            [dst_xy[safe_idx, 0], dst_xy[safe_idx, 1],
             jnp.zeros((K,), jnp.float32), dst_score[safe_idx]], axis=-1)
        bodies = bodies.at[:, dst_joint].set(
            jnp.where(take[:, None], new_joints, bodies[:, dst_joint]))
        remap = remap.at[dst_joint].set(
            jnp.where(take, safe_idx.astype(jnp.int32), remap[dst_joint]))

    return Bodies(joints=bodies, count=person_num,
                  root_depth=jnp.where(person_valid, sorted_depth, 0.0))


def main():
    # correctness on CPU-ish small cases (whatever backend, exactness check)
    pairs = jnp.asarray(PAF_VECTOR, jnp.int32)
    n_mismatch = 0
    for seed in range(30):
        rng = np.random.RandomState(seed)
        J, K_, H, W = NUM_JOINTS, 31, 32, 48
        hm = rng.rand(J, H, W).astype(np.float32)
        pafs = (rng.rand(2 * NUM_LIMBS, H, W) - 0.5).astype(np.float32) * 2
        rdm = (rng.rand(H, W) * 5).astype(np.float32)
        peaks = extract_peaks(jnp.asarray(hm), max_peaks=K_)
        table = paf_scores(jnp.asarray(pafs), peaks, pairs)
        ref = jax.jit(associate)(peaks, table, jnp.asarray(rdm))
        got = jax.jit(associate_parallel)(peaks, table, jnp.asarray(rdm))
        if not (np.array_equal(np.asarray(ref.joints),
                               np.asarray(got.joints))
                and int(ref.count) == int(got.count)):
            n_mismatch += 1
            d = np.max(np.abs(np.asarray(ref.joints)
                              - np.asarray(got.joints)))
            print(f"seed {seed}: MISMATCH max|d|={d}")
    print(f"mismatches: {n_mismatch}/30", flush=True)

    if jax.default_backend() == "cpu":
        return

    # timing on TPU at production shapes
    cfg = PostProcessConfig()
    KA = min(cfg.assoc_peaks, cfg.max_peaks)
    B, H, W = 16, 128, 208
    rng = np.random.RandomState(0)
    kpt = jnp.asarray(rng.rand(B, 15, H, W).astype(np.float32))
    paf = jnp.asarray(rng.rand(B, 28, H, W).astype(np.float32) - 0.5)
    rdm = jnp.asarray(rng.rand(B, H, W).astype(np.float32) * 5)
    peaks = jax.jit(jax.vmap(lambda h: extract_peaks(
        h, max_peaks=cfg.max_peaks, threshold=cfg.nms_threshold)))(kpt)
    peaks_t = jax.jit(lambda p: Peaks(
        xy=p.xy[:, :, :KA], score=p.score[:, :, :KA],
        count=jnp.minimum(p.count, KA)))(peaks)
    table = jax.jit(jax.vmap(lambda pf, pk: paf_scores(pf, pk, pairs)))(
        paf, peaks_t)
    jax.block_until_ready((peaks_t, table))

    for name, fn in [("scan", associate), ("parallel", associate_parallel)]:
        jfn = jax.jit(jax.vmap(lambda pk, tb, rd, f=fn: f(pk, tb, rd)))
        out = jax.block_until_ready(jfn(peaks_t, table, rdm))
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            out = jax.block_until_ready(jfn(peaks_t, table, rdm))
            ts.append(time.perf_counter() - t0)
        print(f"associate_{name}: {np.median(ts)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
