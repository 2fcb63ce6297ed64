"""Pallas kernels vs. the XLA reference implementations (interpret mode)."""

import numpy as np
import pytest

from test_ops import _synthetic_heatmaps


def test_nms_fields_matches_xla(rng):
    import jax.numpy as jnp

    from smap_tpu.ops.nms import _box_filter_7x7, _local_max_mask
    from smap_tpu.ops.pallas_kernels import nms_fields

    hm, _, _, _, _ = _synthetic_heatmaps(rng, h=64, w=128)
    mask, s, sx, sy = nms_fields(jnp.asarray(hm), interpret=True)

    ref_mask = _local_max_mask(jnp.asarray(hm), 0.2)
    np.testing.assert_array_equal(np.asarray(mask) > 0, np.asarray(ref_mask))

    s_pos = jnp.where(jnp.asarray(hm) > 0, jnp.asarray(hm), 0.0)
    xs = jnp.arange(128, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(64, dtype=jnp.float32)[None, :, None]
    np.testing.assert_allclose(np.asarray(s),
                               np.asarray(_box_filter_7x7(s_pos)),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(sx),
                               np.asarray(_box_filter_7x7(s_pos * xs)),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(sy),
                               np.asarray(_box_filter_7x7(s_pos * ys)),
                               rtol=1e-5, atol=1e-3)


def test_associate_limb_matches_greedy(rng):
    import jax.numpy as jnp

    from smap_tpu.ops.pallas_kernels import associate_limb

    K = 16
    table = rng.randn(K, K).astype(np.float32)
    src_xy = rng.rand(K, 2).astype(np.float32) * 50
    dst_xy = rng.rand(K, 2).astype(np.float32) * 50
    src_score = (rng.rand(K) > 0.3).astype(np.float32)
    bone_dist = rng.rand(K).astype(np.float32) * 20 + 5
    person_valid = np.arange(K) < 10
    dst_valid = np.arange(K) < 12

    got = np.asarray(associate_limb(
        jnp.asarray(table), jnp.asarray(src_xy), jnp.asarray(src_score),
        jnp.asarray(dst_xy), jnp.asarray(bone_dist),
        jnp.asarray(person_valid), jnp.asarray(dst_valid), interpret=True))

    # python greedy oracle
    used = np.zeros(K, bool)
    want = np.full(K, -1)
    for k1 in range(K):
        if not person_valid[k1] or src_score[k1] < 1e-5:
            continue
        best, best_idx = 0.0, -1
        for k2 in range(K):
            if used[k2] or not dst_valid[k2]:
                continue
            s = table[k1, k2]
            if s > 0:
                d = np.linalg.norm(src_xy[k1] - dst_xy[k2])
                s += min(bone_dist[k1] / d / 4.0 - 1.0, 0.0)
            if s > best:
                best, best_idx = s, k2
        if best > 0:
            want[k1] = best_idx
            used[best_idx] = True
    np.testing.assert_array_equal(got, want)
