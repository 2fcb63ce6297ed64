"""Fused bottleneck Pallas kernel + the quantized="folded" serving mode.

The kernel (smap_tpu/ops/fused_block.py) exists because the layer1-shape
bottleneck blocks are HBM-bandwidth-bound at 16 TFLOPS unfused
(docs/perf_notes.md round-4; scripts/probes/_dot1x1_probe.py). These
tests pin, on CPU (interpret mode):

* kernel vs a pure-jnp oracle with the identical op chain — exact;
* the folded+fused bf16 model's distance to the f32 live-BN ground
  truth, bounded by the plain bf16 graph's own noise floor (direct
  bf16-vs-bf16 comparisons are accumulation-order noise);
* the fused path's param tree == fold_bn_variables' output tree;
* the serving engine built with quantized="folded" (smoke).
"""

import os

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _rand_block(rng, cin, cm, cout, with_ds):
    w1 = (rng.randn(cin, cm) * 0.2).astype(np.float32)
    b1 = (rng.randn(cm) * 0.1).astype(np.float32)
    w2 = (rng.randn(3, 3, cm, cm) * 0.2).astype(np.float32)
    b2 = (rng.randn(cm) * 0.1).astype(np.float32)
    w3 = (rng.randn(cm, cout) * 0.2).astype(np.float32)
    b3 = (rng.randn(cout) * 0.1).astype(np.float32)
    if with_ds:
        wd = (rng.randn(cin, cout) * 0.2).astype(np.float32)
        bd = (rng.randn(cout) * 0.1).astype(np.float32)
        return w1, b1, w2, b2, w3, b3, wd, bd
    return w1, b1, w2, b2, w3, b3


@pytest.mark.parametrize("shape,tile_rows", [
    ((2, 16, 24, 32, 8, 32), 8),     # identity residual, 2 bands
    ((1, 32, 13, 16, 8, 16), 8),     # odd width
    ((2, 24, 24, 24, 8, 40), 4),     # Cout != Cin (projection only)
])
@pytest.mark.parametrize("with_ds", [False, True])
def test_kernel_matches_oracle(shape, tile_rows, with_ds, rng):
    from smap_tpu.ops.fused_block import (bottleneck_reference,
                                          fused_bottleneck)

    b, h, w, cin, cm, cout = shape
    if cout != cin and not with_ds:
        pytest.skip("identity residual needs Cin == Cout")
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    params = _rand_block(rng, cin, cm, cout, with_ds)
    got = np.asarray(fused_bottleneck(x, *params, tile_rows=tile_rows,
                                      interpret=True), np.float32)
    want = np.asarray(bottleneck_reference(x, *params), np.float32)
    # Same ops/dtypes (bf16 operands, f32 accumulation); only f32
    # summation order may differ by an ulp.
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
    assert np.abs(got - want).max() <= 1e-3


def _tiny_model_and_vars(rng, quantized=False):
    from smap_tpu.config import ModelConfig
    from smap_tpu.models.smap import SMAP

    cfg = ModelConfig(stage_num=1, output_shape=(16, 24),
                      compute_dtype="bfloat16", quantized=quantized)
    model = SMAP(cfg)
    x = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
    return cfg, model, x


def _perturbed_vars(model, x):
    """init, then randomize BN stats/affine so the fold is non-trivial."""
    import jax

    v = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    rng = np.random.RandomState(7)

    def perturb(path, a):
        a = np.asarray(a)
        keys = [getattr(k, "key", "") for k in path]
        if "bn" in keys:
            leaf = keys[-1]
            if leaf == "var":
                return jnp.asarray(rng.uniform(0.5, 2.0, a.shape), a.dtype)
            if leaf in ("mean", "bias"):
                return jnp.asarray(rng.randn(*a.shape) * 0.1, a.dtype)
            if leaf == "scale":
                return jnp.asarray(rng.uniform(0.7, 1.3, a.shape), a.dtype)
        if keys[-1] == "bias":
            return jnp.asarray(rng.randn(*a.shape) * 0.05, a.dtype)
        return jnp.asarray(a)

    return jax.tree_util.tree_map_with_path(perturb, v)


def _rel(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return float(np.sqrt(np.mean((a - b) ** 2))
                 / (np.sqrt(np.mean(a ** 2)) + 1e-9))


def _infer(model, v, x):
    from smap_tpu.models.smap import SMAP

    return jax.jit(lambda v, x: model.apply(v, x, method=SMAP.infer))(v, x)


def test_folded_model_error_vs_f32_truth(rng, monkeypatch):
    """The folded+fused bf16 pipeline lands no farther from the f32
    live-BN ground truth than the plain bf16 live-BN graph does.

    Direct bf16-vs-bf16 comparisons are dominated by accumulation-order
    noise (the fused kernel accumulates in f32 — MORE precise — so the
    two bf16 paths diverge by per-op bf16 roundings amplified through
    relu sign flips at random init). The meaningful invariant: distance
    to the f32 truth. Covers the BN fold (quantize.fold_bn_variables)
    AND the fused Pallas kernel in one bound, and separately pins the
    unfused-folded path so a kernel regression can't hide behind the
    fold."""
    import dataclasses

    import smap_tpu.models.layers as layers
    from smap_tpu.models.quantize import fold_bn_variables
    from smap_tpu.models.smap import SMAP

    cfg, model, x = _tiny_model_and_vars(rng)
    v = _perturbed_vars(model, x)
    fv = jax.jit(fold_bn_variables)(v)
    f32_cfg = dataclasses.replace(cfg, compute_dtype="float32")
    truth = _infer(SMAP(f32_cfg), v, x)                  # live-BN f32
    base = _infer(model, v, x)                           # live-BN bf16
    fold_cfg = dataclasses.replace(cfg, quantized="folded")
    fmodel = SMAP(fold_cfg)
    monkeypatch.setattr(layers, "FUSE_BOTTLENECK", True)
    fused = _infer(fmodel, fv, x)                        # folded bf16 fused
    monkeypatch.setattr(layers, "FUSE_BOTTLENECK", False)
    jax.clear_caches()   # same apply signature, different graph
    unfused = _infer(fmodel, fv, x)                      # folded bf16 plain
    for i, name in enumerate(("2d", "3d", "rd")):
        noise = _rel(truth[i], base[i])                  # bf16 noise floor
        err_fused = _rel(truth[i], fused[i])
        err_unfused = _rel(truth[i], unfused[i])
        assert noise > 0, name                           # floor is real
        # 2x floor: BN-fold reassociation legitimately moves rounding
        # points; what it must NOT do is add a systematic error term.
        assert err_fused <= 2.0 * noise + 1e-4, (name, err_fused, noise)
        assert err_unfused <= 2.0 * noise + 1e-4, (name, err_unfused, noise)


def test_fused_param_tree_matches_folded_tree(rng):
    """The fused path's param-only modules declare EXACTLY the leaves
    fold_bn_variables produces (so folded variables drop in)."""
    import dataclasses

    from smap_tpu.models.quantize import fold_bn_variables
    from smap_tpu.models.smap import SMAP

    cfg, model, x = _tiny_model_and_vars(rng)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    fv = jax.jit(fold_bn_variables)(v)
    fmodel = SMAP(dataclasses.replace(cfg, quantized="folded"))
    fv_init = jax.jit(fmodel.init)(jax.random.PRNGKey(0), x)
    want = jax.tree_util.tree_structure(fv_init["params"])
    got = jax.tree_util.tree_structure(fv["params"])
    assert want == got


@pytest.mark.slow
def test_engine_folded_smoke(rng):
    """SMAPInference(quantized='folded') builds, serves, and its forward
    maps track the plain engine's."""
    from smap_tpu.config import Config, ModelConfig
    from smap_tpu.inference import SMAPInference
    from smap_tpu.models.smap import SMAP

    mcfg = ModelConfig(stage_num=1, output_shape=(16, 24),
                       compute_dtype="bfloat16")
    full = Config(model=mcfg, input_shape=(64, 96), output_shape=(16, 24))
    model = SMAP(mcfg)
    x = np.asarray(rng.randn(2, 64, 96, 3), np.float32)
    v = _perturbed_vars(model, jnp.asarray(x))
    folded = SMAPInference(v, full, quantized="folded")
    plain = SMAPInference(v, full)
    xs = jnp.asarray(x)
    maps_f = folded._jit_forward(folded.variables, xs)
    maps_p = plain._jit_forward(plain.variables, xs)
    # Smoke-level sanity only — both engines are bf16 paths whose direct
    # distance is accumulation-order noise (amplified at random init);
    # the tight numerics bound lives in
    # test_folded_model_error_vs_f32_truth.
    for name, a, b in zip(("2d", "3d", "rd"), maps_p, maps_f):
        rel = _rel(a, b)
        assert rel < 0.15, (name, rel)
    scales = [{"scale": 0.433, "img_width": 1920.0, "img_height": 1080.0,
               "f_x": 1500.0, "f_y": 1500.0, "cx": 960.0, "cy": 540.0}] * 2
    res = folded.run_batch(x, scales)
    assert np.asarray(res.count).shape == (2,)
