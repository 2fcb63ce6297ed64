"""Pallas TPU kernel for the greedy-association hot spot.

``associate_limb``: one limb's sequential nearest-first greedy pass —
person k picks the best unused destination peak under the depth-adaptive
bone-length prior (reference: extensions/association.cpp:164-230) —
entirely in VMEM with a ``fori_loop`` over persons. The pure-XLA
``lax.scan`` equivalent in smap_tpu.ops.association pays ~50 us of
sequential-op overhead per tiny step (14 limbs x K persons ~ 28 ms per
batch-16 at K=40); in-kernel the loop body is a handful of VPU ops on
[1, K]/[K, K] tiles.

Mosaic lowering rules obeyed (the round-1 version failed on these):
no dynamic indexing of *values* (traced-index row reads become one-hot
masked reductions; argmax becomes max + first-match index), iotas are 2D,
and all carried state lives in output/scratch refs.

A fused NMS-fields kernel shipped in round 1 was deleted: the XLA top_k
peak extraction (smap_tpu.ops.nms) measures <1 ms per batch-16, leaving
nothing for a kernel to win back.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_paf_sample_kernel(h: int, w: int, pb: int, parts: int):
    def kernel(m3t_ref, px_ref, py_ref, vx_ref, vy_ref):
        """PAF map sampling for one (limb, sample-chunk) grid cell.

        m3t_ref: [1, 2W, pH] bf16 — transposed stacked map (bf16-split
          parts on the contracted pH axis, x|y map halves on 2W).
        px_ref/py_ref: [1, 1, PB] i32 — a lane-dim chunk of the limb's
          FLATTENED (pair x sample) coordinates.
        vx_ref/vy_ref: [1, 1, PB] f32 map values (exact at parts=3).

        One matmul [2W, pH] @ [pH, PB] per grid cell, no inner loop: an
        earlier variant looped over sample positions inside the cell and
        was sequential-overhead bound (~5.7 us/iteration across 5600
        tiny steps; the matmuls themselves are ~13 ms/batch). All
        transients stay in VMEM — the XLA formulation of the same math
        moves ~1.2 GB of rows/one-hots through HBM per batch.
        """
        m3t = m3t_ref[0]                                     # [2W, pH]
        pyb = py_ref[0]                                      # [1, PB]
        pxb = px_ref[0]
        riota = jax.lax.broadcasted_iota(jnp.int32, (h, pb), 0)
        oy = (riota == pyb).astype(jnp.bfloat16)             # [H, PB]
        oyp = jnp.concatenate([oy] * parts, axis=0)          # [pH, PB]
        rows = jnp.dot(m3t, oyp, preferred_element_type=jnp.float32)
        ciota = jax.lax.broadcasted_iota(jnp.int32, (w, pb), 0)
        ox = (ciota == pxb).astype(jnp.float32)              # [W, PB]
        vx_ref[0] = jnp.sum(rows[:w] * ox, axis=0, keepdims=True)
        vy_ref[0] = jnp.sum(rows[w:] * ox, axis=0, keepdims=True)

    return kernel


def paf_sample(m3t: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray, *,
               h: int, w: int, pair_block: int = 2048, parts: int = 3,
               interpret: bool = False):
    """Fused PAF map sampling for one image.

    Args:
      m3t: [L, 2W, parts*H] bf16 transposed stacked map parts.
      px, py: [L, N] i32 flattened sample coordinates (N = K*K*S).
      parts: bf16 split terms on the contracted axis (3 = exact f32).

    Returns:
      (vx, vy): [L, N] f32 map values at the samples (exact at parts=3).
    """
    L, N = px.shape
    # One grid cell per (limb, lane chunk); pad the flattened sample axis
    # to a whole number of chunks (padded coords sample pixel (0, 0)
    # harmlessly and are sliced off below).
    pb = min(pair_block, -(-N // 128) * 128)
    n_pad = -(-N // pb) * pb
    px = jnp.pad(px, ((0, 0), (0, n_pad - N))).reshape(L, 1, n_pad)
    py = jnp.pad(py, ((0, 0), (0, n_pad - N))).reshape(L, 1, n_pad)
    out = jax.ShapeDtypeStruct((L, 1, n_pad), jnp.float32)
    coord_spec = pl.BlockSpec((1, 1, pb), lambda l, c: (l, 0, c),
                              memory_space=pltpu.VMEM)
    vx, vy = pl.pallas_call(
        _make_paf_sample_kernel(h, w, pb, parts),
        grid=(L, n_pad // pb),
        in_specs=[
            pl.BlockSpec((1, 2 * w, parts * h), lambda l, c: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            coord_spec,
            coord_spec,
        ],
        out_specs=(coord_spec, coord_spec),
        out_shape=(out, out),
        interpret=interpret,
    )(m3t, px, py)
    return vx[:, 0, :N], vy[:, 0, :N]


def _associate_limb_kernel(scores_ref, valid_ref, assign_ref, used_ref):
    """Sequential greedy over persons, all in VMEM.

    scores_ref: [K, K] f32 — adjusted scores, row = person in greedy
      (depth-sorted) order; invalid persons/slots already -inf.
    valid_ref: [1, K] f32 — 1.0 where the dst peak slot is real.
    assign_ref (out): [1, K] i32 — chosen dst peak per person, -1 = none.
    used_ref (scratch->out): [1, K] i32 — consumed dst peaks.
    """
    K = scores_ref.shape[0]
    assign_ref[:] = jnp.full_like(assign_ref, -1)
    used_ref[:] = jnp.zeros_like(used_ref)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)     # [1, K]

    def body(k1, _):
        # Row k1 of the score table as [1, K]: mask other rows to -inf and
        # max-reduce (no dynamic value indexing in Mosaic).
        row_mask = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0) == k1
        scores = jnp.max(jnp.where(row_mask, scores_ref[:], -jnp.inf),
                         axis=0, keepdims=True)              # [1, K]
        blocked = (used_ref[:] > 0) | (valid_ref[:] < 0.5)
        scores = jnp.where(blocked, -jnp.inf, scores)
        best = jnp.max(scores)
        # Reference keeps a new max only when strictly greater with the
        # running max starting at 0 (association.cpp:215-220): the winner
        # needs score > 0, and ties resolve to the first (lowest) index.
        first = jnp.min(jnp.where(scores == best, col, K))
        take = best > 0.0

        @pl.when(take)
        def _():
            used_ref[:] = jnp.where(col == first, 1, used_ref[:])
            krow = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1) == k1
            assign_ref[:] = jnp.where(krow, first, assign_ref[:])

        return 0

    jax.lax.fori_loop(0, K, body, 0)


def _associate_limb_batched_kernel(scores_ref, valid_ref, assign_ref,
                                   used_ref):
    """Batch-parallel sequential greedy: step k1 runs for ALL images at
    once as [B, K] vector ops (the per-image kernel under vmap serializes
    B x K tiny steps on the one TensorCore; this runs K steps of B-wide
    work — same greedy semantics per image, ~B x fewer sequential steps).

    scores_ref: [B, K, K] f32 adjusted scores (rows = persons in greedy
      order, invalid persons/slots already -inf).
    valid_ref: [B, K] f32 — 1.0 where the dst peak slot is real.
    assign_ref (out): [B, K] i32 — chosen dst peak per person, -1 = none.
    used_ref (scratch->out): [B, K] i32 — consumed dst peaks.
    """
    B, K = valid_ref.shape
    assign_ref[:] = jnp.full_like(assign_ref, -1)
    used_ref[:] = jnp.zeros_like(used_ref)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)

    def body(k1, carry):
        scores = scores_ref[:, pl.ds(k1, 1), :].reshape(B, K)
        blocked = (used_ref[:] > 0) | (valid_ref[:] < 0.5)
        scores = jnp.where(blocked, -jnp.inf, scores)
        best = jnp.max(scores, axis=1, keepdims=True)        # [B, 1]
        # Strictly-greater semantics with running max 0 and first-index
        # tie-break, as in the per-image kernel (association.cpp:215-220).
        first = jnp.min(jnp.where(scores == best, col, K), axis=1,
                        keepdims=True)
        take = best > 0.0                                    # [B, 1]
        used_ref[:] = jnp.where((col == first) & take, 1, used_ref[:])
        krow = col == k1
        assign_ref[:] = jnp.where(krow & take, first, assign_ref[:])
        return carry

    jax.lax.fori_loop(0, K, body, 0)


def _associate_limb_single(scores_all, dst_slot_valid, interpret):
    K = scores_all.shape[0]
    assign, _ = pl.pallas_call(
        _associate_limb_kernel,
        out_shape=(jax.ShapeDtypeStruct((1, K), jnp.int32),
                   jax.ShapeDtypeStruct((1, K), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(2)),
        interpret=interpret,
    )(scores_all.astype(jnp.float32),
      dst_slot_valid.reshape(1, K).astype(jnp.float32))
    return assign[0]


def _associate_limb_batched(scores_all, dst_slot_valid, interpret):
    B, K = scores_all.shape[0], scores_all.shape[1]
    assign, _ = pl.pallas_call(
        _associate_limb_batched_kernel,
        out_shape=(jax.ShapeDtypeStruct((B, K), jnp.int32),
                   jax.ShapeDtypeStruct((B, K), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(2)),
        interpret=interpret,
    )(scores_all.astype(jnp.float32),
      dst_slot_valid.astype(jnp.float32))
    return assign


def associate_limb(scores_all: jnp.ndarray, dst_slot_valid: jnp.ndarray, *,
                   interpret: bool = False) -> jnp.ndarray:
    """Greedy per-limb assignment.

    Under ``jax.vmap`` (the batched post-processing pipeline), a custom
    batching rule swaps in the batch-parallel kernel instead of
    serializing per-image grid cells.

    Args:
      scores_all: [K, K] f32 adjusted score matrix (person-major, already
        penalty-adjusted and masked to -inf for invalid persons).
      dst_slot_valid: [K] bool.

    Returns:
      [K] int32 — chosen dst peak per person (-1 = none).
    """

    @jax.custom_batching.custom_vmap
    def inner(s, v):
        return _associate_limb_single(s, v, interpret)

    @inner.def_vmap
    def _rule(axis_size, in_batched, s, v):  # noqa: ANN001
        s_b, v_b = in_batched
        if not s_b:
            s = jnp.broadcast_to(s, (axis_size,) + s.shape)
        if not v_b:
            v = jnp.broadcast_to(v, (axis_size,) + v.shape)
        return _associate_limb_batched(s, v, interpret), True

    return inner(scores_all, dst_slot_valid)
