"""Space-to-depth stem lowering (layers.s2d_conv7x7s2).

The 7x7/2 Cin=3 stem conv measured 3% MFU on the target part — the
3-channel input leaves the lane dimension ~97% idle (perf_notes
round-4). The s2d rewrite is the SAME contraction reindexed (2x2
space-to-depth + 4x4/1 conv on 12 channels), so it must be numerically
identical to the direct conv in f32 up to accumulation order.
"""

import os

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


@pytest.mark.parametrize("shape", [(2, 64, 96, 3), (1, 30, 44, 3),
                                   (2, 16, 24, 4)])
def test_s2d_conv_matches_direct(shape, rng):
    from smap_tpu.models.layers import s2d_conv7x7s2

    b, h, w, c = shape
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    k = jnp.asarray((rng.randn(7, 7, c, 64) * 0.1).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        x, k, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = jax.jit(s2d_conv7x7s2)(x, k)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-5)


def test_conv2d_module_uses_s2d_for_stem_shape(rng, monkeypatch):
    """Conv2D with the stem's exact geometry routes through s2d and
    matches the direct lowering on the same params."""
    import smap_tpu.models.layers as layers
    from smap_tpu.models.layers import Conv2D

    x = jnp.asarray(rng.randn(1, 32, 48, 3).astype(np.float32))
    mod = Conv2D(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)))
    v = mod.init(jax.random.PRNGKey(0), x)
    monkeypatch.setattr(layers, "STEM_IMPL", "s2d")
    got = jax.jit(lambda v, x: mod.apply(v, x))(v, x)
    monkeypatch.setattr(layers, "STEM_IMPL", "conv")
    jax.clear_caches()
    want = jax.jit(lambda v, x: mod.apply(v, x))(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-5)


def test_s2d_gradients_match(rng):
    """Training uses the same lowering — gradients must agree with the
    direct conv's."""
    from smap_tpu.models.layers import s2d_conv7x7s2

    x = jnp.asarray(rng.randn(1, 16, 24, 3).astype(np.float32))
    k = jnp.asarray((rng.randn(7, 7, 3, 8) * 0.1).astype(np.float32))

    def direct(k):
        return jnp.sum(jax.lax.conv_general_dilated(
            x, k, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) ** 2)

    def s2d(k):
        return jnp.sum(s2d_conv7x7s2(x, k) ** 2)

    g_direct = jax.jit(jax.grad(direct))(k)
    g_s2d = jax.jit(jax.grad(s2d))(k)
    np.testing.assert_allclose(np.asarray(g_s2d), np.asarray(g_direct),
                               atol=1e-3, rtol=1e-4)
