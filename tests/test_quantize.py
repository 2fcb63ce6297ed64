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
