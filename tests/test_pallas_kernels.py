"""Pallas association kernel vs. the XLA scan implementation.

Interpret mode on CPU here; the compiled Mosaic lowering is exercised on
real TPU by scripts/probes/_pallas_compile_probe.py (verified in round 2:
compiles, matches interpret mode and the numpy greedy oracle).
"""

import numpy as np
import pytest


def _greedy_oracle(scores, dst_valid):
    """Sequential nearest-first greedy (association.cpp:181-230 semantics
    on an already penalty-adjusted score matrix)."""
    K = scores.shape[0]
    used = np.zeros(K, bool)
    want = np.full(K, -1, np.int64)
    for k1 in range(K):
        s = scores[k1].copy()
        s[used] = -np.inf
        s[~dst_valid] = -np.inf
        best = int(np.argmax(s))
        if s[best] > 0:
            want[k1] = best
            used[best] = True
    return want


@pytest.mark.parametrize("seed", [0, 1])
def test_paf_sample_matches_gather(seed):
    """paf_scores(impl='pallas', kernel in interpret mode) == impl='gather'
    bit-exactly: one-hot selection has no accumulation, so the bf16x3 map
    split reconstructs f32 values exactly (smap_tpu/ops/paf.py)."""
    import jax.numpy as jnp

    from smap_tpu.config import PAF_VECTOR
    from smap_tpu.ops import pallas_kernels
    from smap_tpu.ops.nms import extract_peaks
    from smap_tpu.ops.paf import paf_scores

    rng = np.random.RandomState(seed)
    hm = rng.rand(15, 32, 48).astype(np.float32)
    pafs = ((rng.rand(28, 32, 48).astype(np.float32) - 0.5) * 2)
    peaks = extract_peaks(jnp.asarray(hm), max_peaks=31)
    pairs = jnp.asarray(PAF_VECTOR, jnp.int32)

    orig = pallas_kernels.paf_sample
    calls = []

    def interp_kernel(*a, **kw):
        calls.append(1)
        kw["interpret"] = True
        return orig(*a, **kw)

    ref = paf_scores(jnp.asarray(pafs), peaks, pairs, impl="gather")
    pallas_kernels.paf_sample = interp_kernel
    try:
        got = paf_scores(jnp.asarray(pafs), peaks, pairs, impl="pallas")
    finally:
        pallas_kernels.paf_sample = orig
    assert calls, "pallas path not exercised"
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_bf16_split_precision_ladder(rng):
    """_split_bf16 reconstruction: 3 parts exact, 2 parts ~2^-16 rel,
    1 part = plain bf16 (the paf_parts serving knob's error model)."""
    import jax.numpy as jnp

    from smap_tpu.ops.paf import _split_bf16

    m = jnp.asarray((rng.rand(64, 64).astype(np.float32) - 0.5) * 2)
    for parts, tol in ((3, 0.0), (2, 2.0 ** -15), (1, 2.0 ** -7)):
        rec = sum(t.astype(jnp.float32) for t in _split_bf16(m, parts))
        err = np.abs(np.asarray(rec) - np.asarray(m))
        rel = err / np.maximum(np.abs(np.asarray(m)), 1e-6)
        assert rel.max() <= tol, (parts, rel.max())


def test_paf_scores_parts2_close_to_exact(rng):
    """parts=2 sampling stays within ~1e-4 of the exact table on entries
    where both agree on the pass/threshold pattern (vast majority)."""
    import jax.numpy as jnp

    from smap_tpu.config import PAF_VECTOR
    from smap_tpu.ops.nms import extract_peaks
    from smap_tpu.ops.paf import paf_scores

    hm = rng.rand(15, 32, 48).astype(np.float32)
    pafs = ((rng.rand(28, 32, 48).astype(np.float32) - 0.5) * 2)
    peaks = extract_peaks(jnp.asarray(hm), max_peaks=15)
    pairs = jnp.asarray(PAF_VECTOR, jnp.int32)
    exact = np.asarray(paf_scores(jnp.asarray(pafs), peaks, pairs,
                                  impl="onehot", parts=3))
    approx = np.asarray(paf_scores(jnp.asarray(pafs), peaks, pairs,
                                   impl="onehot", parts=2))
    close = np.abs(exact - approx) < 1e-4
    assert close.mean() > 0.99, close.mean()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_associate_limb_matches_greedy(seed):
    import jax.numpy as jnp

    from smap_tpu.ops.pallas_kernels import associate_limb

    rng = np.random.RandomState(seed)
    K = 40
    scores = (rng.rand(K, K).astype(np.float32) * 2 - 1)
    scores[rng.rand(K) < 0.3] = -np.inf       # invalid persons
    dst_valid = np.arange(K) < rng.randint(1, K)

    got = np.asarray(associate_limb(jnp.asarray(scores),
                                    jnp.asarray(dst_valid), interpret=True))
    np.testing.assert_array_equal(got, _greedy_oracle(scores, dst_valid))


def test_associate_limb_batched_rule_matches_greedy(rng):
    """vmap(associate_limb) routes through the batch-parallel kernel via
    the custom batching rule and must match the per-image greedy oracle."""
    import jax
    import jax.numpy as jnp

    from smap_tpu.ops.pallas_kernels import associate_limb

    B, K = 5, 24
    scores = (rng.rand(B, K, K).astype(np.float32) * 2 - 1)
    for b in range(B):
        scores[b, rng.rand(K) < 0.3] = -np.inf
    dst_valid = np.stack([np.arange(K) < rng.randint(1, K)
                          for _ in range(B)])

    got = np.asarray(jax.vmap(
        lambda s, v: associate_limb(s, v, interpret=True))(
            jnp.asarray(scores), jnp.asarray(dst_valid)))
    ref = np.stack([_greedy_oracle(scores[b], dst_valid[b])
                    for b in range(B)])
    np.testing.assert_array_equal(got, ref)


def test_associate_impl_parity(rng):
    """associate(impl='pallas', interpret via CPU) == associate(impl='scan')
    end to end on random peak tables."""
    import jax
    import jax.numpy as jnp

    from smap_tpu.config import PAF_VECTOR
    from smap_tpu.ops.association import associate
    from smap_tpu.ops.nms import extract_peaks
    from smap_tpu.ops.paf import paf_scores

    if jax.default_backend() != "cpu":
        pytest.skip("interpret-mode parity gate runs on CPU")

    # monkeypatch-free: drive the pallas path in interpret mode by calling
    # the kernel wrapper directly through associate's impl knob is not
    # possible on CPU (compiled pallas requires TPU), so compare the
    # kernel (interpret) against the scan inside associate via the shared
    # score-matrix contract instead.
    from smap_tpu.ops import association as assoc_mod
    from smap_tpu.ops import pallas_kernels

    orig = pallas_kernels.associate_limb
    calls = []

    def interp_kernel(scores_all, dst_slot_valid, **kw):
        calls.append(1)
        return orig(scores_all, dst_slot_valid, interpret=True)

    pairs = jnp.asarray(PAF_VECTOR, jnp.int32)
    hm = rng.rand(15, 32, 48).astype(np.float32)
    pafs = (rng.rand(28, 32, 48).astype(np.float32) - 0.5) * 2
    rdm = (rng.rand(32, 48) * 5).astype(np.float32)
    peaks = extract_peaks(jnp.asarray(hm), max_peaks=31)
    table = paf_scores(jnp.asarray(pafs), peaks, pairs)

    ref = associate(peaks, table, jnp.asarray(rdm), impl="scan")
    pallas_kernels.associate_limb = interp_kernel
    try:
        got = associate(peaks, table, jnp.asarray(rdm), impl="pallas")
    finally:
        pallas_kernels.associate_limb = orig
    assert calls, "pallas path not exercised"
    np.testing.assert_array_equal(np.asarray(ref.joints),
                                  np.asarray(got.joints))
    assert int(ref.count) == int(got.count)
