"""int8 serving forward: BN fold + per-channel weight quantization.

Opt-in speed path (smap_tpu/models/quantize.py) — these tests pin that
(a) the quantized graph tracks the f32 graph closely even on untrained
random weights (the hardest case: activations are unnormalized and span
±3e5), (b) the BN fold is exact when quantization is the only error
source, and (c) the engine-level opt-in (SMAPInference(quantized=True))
runs end to end.
"""

import dataclasses

import numpy as np
import pytest


def _perturbed_tiny(rng_seed=1):
    import jax
    import jax.numpy as jnp

    from smap_tpu.config import ModelConfig
    from smap_tpu.models.smap import SMAP

    cfg = ModelConfig(stage_num=3, output_shape=(16, 24),
                      compute_dtype="float32")
    m = SMAP(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 96, 3),
                    jnp.float32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)

    # Non-trivial running stats so the BN fold is actually exercised.
    rng = np.random.RandomState(rng_seed)

    def perturb(t):
        out = {}
        for k, val in t.items():
            if isinstance(val, dict):
                out[k] = perturb(val)
            elif k == "var":
                out[k] = jnp.asarray(np.abs(rng.rand(*val.shape) * 2 + 0.5),
                                     jnp.float32)
            elif k == "mean":
                out[k] = jnp.asarray(rng.randn(*val.shape) * 0.1,
                                     jnp.float32)
            else:
                out[k] = val
        return out

    return cfg, m, x, {"params": v["params"],
                       "batch_stats": perturb(v["batch_stats"])}


@pytest.mark.slow
def test_quantized_forward_tracks_f32():
    import jax

    from smap_tpu.models.quantize import quantize_variables
    from smap_tpu.models.smap import SMAP

    cfg, m, x, v = _perturbed_tiny()
    f32out = jax.jit(lambda v, x: m.apply(v, x, method=SMAP.infer))(v, x)
    qm = SMAP(dataclasses.replace(cfg, quantized=True))
    qv = jax.jit(quantize_variables)(v)
    qout = jax.jit(lambda v, x: qm.apply(v, x, method=SMAP.infer))(qv, x)
    # Measured on this configuration: rms_rel 0.033/0.027/0.108 and
    # corr >= 0.994 (the 1-channel root-depth head is the loosest on
    # random weights). Gates leave ~2x headroom.
    for name, a, b, tol in (("2d", f32out[0], qout[0], 0.08),
                            ("3d", f32out[1], qout[1], 0.08),
                            ("rd", f32out[2], qout[2], 0.25)):
        a, b = np.asarray(a), np.asarray(b)
        rel = (np.sqrt(np.mean((a - b) ** 2))
               / (np.sqrt(np.mean(a ** 2)) + 1e-9))
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert rel < tol, (name, rel)
        assert corr > 0.98, (name, corr)


def test_bn_fold_is_exact_modulo_quantization():
    """With kernels already exactly representable on the int8 grid, the
    only difference between ConvBnRelu(f32) and the folded int8 path is
    the activation quantization — bounded by max|x|/254 per element."""
    import jax
    import jax.numpy as jnp

    from smap_tpu.models.layers import ConvBnRelu
    from smap_tpu.models.quantize import quantize_variables

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
    mod = ConvBnRelu(8, (3, 3))
    v = mod.init(jax.random.PRNGKey(0), x)
    # int8-grid kernel and identity-ish BN with non-trivial stats
    grid = rng.randint(-127, 128, (3, 3, 16, 8)).astype(np.float32)
    scale = np.abs(rng.rand(8)).astype(np.float32) + 0.5
    v = {
        "params": {
            "conv": {"kernel": jnp.asarray(grid / 127.0 * scale),
                     "bias": jnp.asarray(rng.randn(8), jnp.float32)},
            "bn": {"scale": jnp.asarray(np.abs(rng.rand(8)) + 0.5,
                                        jnp.float32),
                   "bias": jnp.asarray(rng.randn(8), jnp.float32)},
        },
        "batch_stats": {"bn": {
            "mean": jnp.asarray(rng.randn(8) * 0.1, jnp.float32),
            "var": jnp.asarray(np.abs(rng.rand(8)) + 0.5, jnp.float32),
        }},
    }
    want = np.asarray(mod.apply(v, x, False))
    qv = quantize_variables(v)
    qmod = ConvBnRelu(8, (3, 3), quant=True)
    got = np.asarray(qmod.apply(qv, x, False))
    # activation quant step is max|x|/127; conv accumulates 3*3*16 terms
    step = float(np.max(np.abs(x))) / 127.0
    bound = step * 3 * 3 * 16 * float(np.max(np.abs(grid / 127.0 * scale)))
    assert np.max(np.abs(got - want)) < bound
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.999


def test_static_conv_matches_dynamic_on_calib_batch():
    """Single quant conv block: freezing the scale observed on a batch and
    re-running statically is bit-identical to the dynamic run on that same
    batch (the frozen scale IS that batch's dynamic scale)."""
    import jax
    import jax.numpy as jnp

    from smap_tpu.models.layers import ConvBnRelu
    from smap_tpu.models.quantize import quantize_variables

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8, 16) * 3.0, jnp.float32)
    mod = ConvBnRelu(8, (3, 3))
    v = mod.init(jax.random.PRNGKey(0), x)
    qv = quantize_variables(v)
    dyn = ConvBnRelu(8, (3, 3), quant=True)
    want, mut = dyn.apply(qv, x, False, mutable=["intermediates"])
    absmax = mut["intermediates"]["conv"]["act_absmax"]
    absmax = np.max([np.float32(a) for a in absmax])
    sv = {"params": dict(qv["params"])}
    sv["params"]["conv"] = dict(sv["params"]["conv"])
    sv["params"]["conv"]["act_scale"] = jnp.asarray(
        np.maximum(np.float32(absmax), np.float32(1e-6))
        * np.float32(1.0 / 127.0), jnp.float32)
    static = ConvBnRelu(8, (3, 3), quant="static")
    got = static.apply(sv, x, False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_check_static_scales_rejects_uncalibrated():
    """The 0-init sentinel and missing scales are rejected loudly."""
    import jax.numpy as jnp

    from smap_tpu.models.quantize import check_static_scales

    good = {"params": {"blk": {"conv": {
        "kernel_q": jnp.zeros((3, 3, 4, 4), jnp.int8),
        "kernel_scale": jnp.ones((4,)), "bias": jnp.zeros((4,)),
        "act_scale": jnp.asarray(0.5, jnp.float32)}}}}
    check_static_scales(good)   # does not raise
    sentinel = {"params": {"blk": {"conv": {
        "kernel_q": jnp.zeros((3, 3, 4, 4), jnp.int8),
        "act_scale": jnp.asarray(0.0, jnp.float32)}}}}
    with pytest.raises(ValueError, match="uncalibrated"):
        check_static_scales(sentinel)
    missing = {"params": {"blk": {"conv": {
        "kernel_q": jnp.zeros((3, 3, 4, 4), jnp.int8)}}}}
    with pytest.raises(ValueError, match="no act_scale"):
        check_static_scales(missing)


def test_engine_static_uncalibrated_rejected():
    """SMAPInference with quantized='static' refuses to serve variables
    that never went through calibration, and refuses quantized='static'
    without calibration batches."""
    import dataclasses

    import jax.numpy as jnp

    from smap_tpu.config import Config, ModelConfig
    from smap_tpu.inference import SMAPInference

    cfg = Config(model=ModelConfig(stage_num=1, output_shape=(16, 24),
                                   quantized="static"),
                 input_shape=(64, 96), output_shape=(16, 24))
    fake = {"params": {"top": {"conv": {"conv": {
        "kernel_q": jnp.zeros((7, 7, 3, 64), jnp.int8),
        "kernel_scale": jnp.ones((64,)), "bias": jnp.zeros((64,)),
        "act_scale": jnp.asarray(0.0, jnp.float32)}}}}}
    with pytest.raises(ValueError, match="uncalibrated"):
        SMAPInference(fake, cfg)
    plain = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, quantized=False))
    with pytest.raises(ValueError, match="calibration_batches"):
        SMAPInference(fake, plain, quantized="static")


@pytest.mark.slow
def test_static_model_calibration_and_generalization():
    """Full tiny model: (a) static infer is bit-identical to dynamic infer
    on the single calibration batch itself, (b) stays bounded-close on a
    second in-range batch (frozen scales, no per-call reductions)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from smap_tpu.models.quantize import (calibrate_activation_scales,
                                          check_static_scales,
                                          quantize_variables)
    from smap_tpu.models.smap import SMAP

    cfg, m, x, v = _perturbed_tiny()
    qv = jax.jit(quantize_variables)(v)
    qm = SMAP(dataclasses.replace(cfg, quantized=True))
    sm = SMAP(dataclasses.replace(cfg, quantized="static"))
    sv = calibrate_activation_scales(qv, cfg, x)
    check_static_scales(sv)
    dyn = jax.jit(lambda v, x: qm.apply(v, x, method=SMAP.infer))(qv, x)
    stat = jax.jit(lambda v, x: sm.apply(v, x, method=SMAP.infer))(sv, x)
    for a, b in zip(dyn, stat):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Second batch, scaled INSIDE the calibration range: static clips
    # nothing, so it still tracks the dynamic graph closely (not exactly:
    # the frozen scales are the calibration batch's, not this one's).
    x2 = jnp.asarray(np.random.RandomState(9).randn(*x.shape) * 0.7,
                     jnp.float32)
    dyn2 = jax.jit(lambda v, x: qm.apply(v, x, method=SMAP.infer))(qv, x2)
    stat2 = jax.jit(lambda v, x: sm.apply(v, x, method=SMAP.infer))(sv, x2)
    # The 1-channel root-depth head is the loosest on random weights (same
    # ranking as test_quantized_forward_tracks_f32's gates).
    for name, a, b, tol in (("2d", dyn2[0], stat2[0], 0.1),
                            ("3d", dyn2[1], stat2[1], 0.1),
                            ("rd", dyn2[2], stat2[2], 0.3)):
        a, b = np.asarray(a), np.asarray(b)
        rel = (np.sqrt(np.mean((a - b) ** 2))
               / (np.sqrt(np.mean(a ** 2)) + 1e-9))
        assert rel < tol, (name, rel)


@pytest.mark.slow
def test_engine_static_smoke():
    """SMAPInference(quantized='static', calibration_batches=...) builds,
    serves, and its forward maps equal the dynamic engine's on the
    calibration batch."""
    import numpy as np

    from smap_tpu.config import Config
    from smap_tpu.inference import SMAPInference

    cfg, m, x, v = _perturbed_tiny()
    full = Config(model=cfg, input_shape=(64, 96), output_shape=(16, 24))
    st = SMAPInference(v, full, quantized="static", calibration_batches=x)
    dyn = SMAPInference(v, full, quantized=True)
    import jax.numpy as jnp
    xs = jnp.asarray(x)
    maps_s = st._jit_forward(st.variables, xs)
    maps_d = dyn._jit_forward(dyn.variables, xs)
    for a, b in zip(maps_d, maps_s):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    scales = [{"scale": 0.433, "img_width": 1920.0, "img_height": 1080.0,
               "f_x": 1500.0, "f_y": 1500.0, "cx": 960.0, "cy": 540.0}] * 2
    res = st.run_batch(np.asarray(x), scales)
    assert np.asarray(res.count).shape == (2,)


@pytest.mark.slow
def test_engine_quantized_smoke():
    """SMAPInference(quantized=True) converts + runs end to end."""
    from smap_tpu.config import Config, ModelConfig
    from smap_tpu.inference import SMAPInference

    cfg, m, x, v = _perturbed_tiny()
    full = Config(model=cfg, input_shape=(64, 96), output_shape=(16, 24))
    engine = SMAPInference(v, full, quantized=True)
    scales = [{"scale": 0.433, "img_width": 1920.0, "img_height": 1080.0,
               "f_x": 1500.0, "f_y": 1500.0, "cx": 960.0, "cy": 540.0}] * 2
    res = engine.run_batch(np.asarray(x), scales)
    counts = np.asarray(res.count)
    assert counts.shape == (2,)
    assert np.all(counts >= 0)
