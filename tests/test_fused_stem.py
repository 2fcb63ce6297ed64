"""Fused Pallas stem (smap_tpu/ops/fused_stem.py).

The stem (7x7/2 Cin=3 conv + 3x3/2 maxpool) is the forward's worst
section per FLOP on the target part — 3% MFU conv, ~8x-over-bound
reduce_window (docs/perf_notes.md round-4 stem decomposition). The
kernel does the whole stem in one HBM pass from the double
space-to-depth layout (column parity folded into lanes so the in-kernel
pool never makes a strided vector access — Mosaic rejects those). These
tests pin it (CPU interpret mode) against a pure-XLA oracle with the
identical op chain, across edge-relevant shapes.
"""

import os

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


@pytest.mark.parametrize("shape", [
    # b, h, w, cin, cout, tile_p
    (2, 64, 96, 3, 64, 8),    # 2 row bands
    (1, 32, 48, 3, 16, 4),    # tile_p=4, single band edge case
    (2, 64, 64, 4, 32, 8),    # cin=4
    (1, 128, 96, 3, 8, 8),    # 4 bands (interior bands on both sides)
])
def test_fused_stem_matches_oracle(shape, rng):
    from smap_tpu.ops.fused_stem import (double_space_to_depth, fused_stem,
                                         stem_reference)

    b, h, w, cin, cout, tile_p = shape
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    k = jnp.asarray((rng.randn(7, 7, cin, cout) * 0.2).astype(np.float32))
    bias = jnp.asarray((rng.randn(cout) * 0.1).astype(np.float32))
    want = np.asarray(stem_reference(x, k, bias), np.float32)
    got = np.asarray(fused_stem(double_space_to_depth(x), k, bias,
                                tile_p=tile_p, interpret=True), np.float32)
    assert got.shape == want.shape
    # Identical op chain and dtypes; only f32 accumulation order differs.
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=1e-2)


def test_space_to_depth_roundtrip(rng):
    from smap_tpu.ops.fused_stem import space_to_depth

    x = rng.randn(2, 8, 10, 3).astype(np.float32)
    y = np.asarray(space_to_depth(jnp.asarray(x)))
    # y[r, s, (a, b, c)] = x[2r+a, 2s+b, c]
    for r, s, a, b, c in [(0, 0, 0, 0, 0), (1, 2, 1, 0, 2), (3, 4, 1, 1, 1)]:
        assert y[0, r, s, a * 6 + b * 3 + c] == x[0, 2 * r + a, 2 * s + b, c]


def test_double_space_to_depth_indexing(rng):
    from smap_tpu.ops.fused_stem import double_space_to_depth, space_to_depth

    x = rng.randn(2, 8, 12, 3).astype(np.float32)
    y = np.asarray(space_to_depth(jnp.asarray(x)))       # [2, 4, 6, 12]
    d = np.asarray(double_space_to_depth(jnp.asarray(x)))  # [2, 4, 3, 24]
    # d[r, s4, par*12 + ch] = y[r, 2*s4 + par, ch]
    for r, s4, par, ch in [(0, 0, 0, 0), (1, 2, 1, 7), (3, 1, 1, 11),
                           (2, 2, 0, 5)]:
        assert d[1, r, s4, par * 12 + ch] == y[1, r, 2 * s4 + par, ch]


def test_folded_model_fused_stem_matches_unfused(rng, monkeypatch):
    """The FUSE_STEM path through the full folded model: same param
    tree (folded variables drop in) and outputs within the bf16 noise
    floor of the unfused folded graph (the kernel accumulates in f32 —
    the exact-parity bound lives in test_fused_stem_matches_oracle)."""
    import dataclasses

    from tests.test_fused_block import (_perturbed_vars, _rel,
                                        _tiny_model_and_vars)

    import smap_tpu.models.smap as smap_mod
    from smap_tpu.models.quantize import fold_bn_variables
    from smap_tpu.models.smap import SMAP

    cfg, model, x = _tiny_model_and_vars(rng)
    v = _perturbed_vars(model, x)
    fv = jax.jit(fold_bn_variables)(v)
    fold_cfg = dataclasses.replace(cfg, quantized="folded")
    fmodel = SMAP(fold_cfg)

    def infer(v, x):
        return jax.jit(lambda v, x: fmodel.apply(v, x,
                                                 method=SMAP.infer))(v, x)

    f32 = dataclasses.replace(cfg, compute_dtype="float32")
    truth = jax.jit(lambda v, x: SMAP(f32).apply(
        v, x, method=SMAP.infer))(v, x)
    monkeypatch.setattr(smap_mod, "FUSE_STEM", True)
    # Param tree with the fused stem == fold_bn_variables' output tree.
    fv_init = jax.jit(fmodel.init)(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(fv_init["params"])
            == jax.tree_util.tree_structure(fv["params"]))
    fused = infer(fv, x)
    monkeypatch.setattr(smap_mod, "FUSE_STEM", False)
    jax.clear_caches()   # same apply signature, different graph
    unfused = infer(fv, x)
    base = jax.jit(lambda v, x: model.apply(v, x,
                                            method=SMAP.infer))(v, x)
    for i, name in enumerate(("2d", "3d", "rd")):
        noise = _rel(truth[i], base[i])      # plain-bf16 noise floor
        assert noise > 0, name
        assert _rel(truth[i], fused[i]) <= 2.0 * noise + 1e-4, name
        assert _rel(fused[i], unfused[i]) <= 2.0 * noise + 1e-4, name


def test_stem_negative_bias_pool_pad(rng):
    """All-negative conv outputs relu to 0; the pool pad must not win
    over real values (pad is zero = relu floor, consistent)."""
    from smap_tpu.ops.fused_stem import (double_space_to_depth, fused_stem,
                                         stem_reference)

    x = jnp.asarray(rng.randn(1, 32, 48, 3).astype(np.float32))
    k = jnp.asarray((rng.randn(7, 7, 3, 16) * 0.05).astype(np.float32))
    bias = jnp.asarray(np.full((16,), -10.0, np.float32))  # relu -> all 0
    want = np.asarray(stem_reference(x, k, bias), np.float32)
    got = np.asarray(fused_stem(double_space_to_depth(x), k, bias, tile_p=4,
                                interpret=True), np.float32)
    np.testing.assert_array_equal(got, want)
    assert got.max() == 0.0
