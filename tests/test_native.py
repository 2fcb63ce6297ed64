"""Native preprocessing library vs. the cv2/numpy reference path."""

import numpy as np
import pytest

from smap_tpu.data.native import (letterbox_normalize_native,
                                  native_available)
from smap_tpu.data.preprocess import letterbox_image, normalize_image


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
@pytest.mark.parametrize("hw", [(1080, 1920), (2048, 2048), (480, 640),
                                (512, 832)])
def test_native_matches_cv2(rng, hw):
    img = (rng.rand(*hw, 3) * 255).astype(np.uint8)
    got, scale_n = letterbox_normalize_native(img)
    boxed, scale_p = letterbox_image(img)
    want = normalize_image(boxed)
    assert got.shape == want.shape == (512, 832, 3)
    assert scale_n["scale"] == pytest.approx(scale_p["scale"])
    # cv2 uses fixed-point bilinear; allow ~2 uint8 LSB of divergence on a
    # fraction of pixels, and strict agreement on padding.
    diff = np.abs(got - want)
    lsb = 2.0 / 255.0 / min(0.224, 0.225, 0.229)
    assert np.mean(diff < lsb) > 0.99
    assert diff.max() < 12 * lsb


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_padding_regions(rng):
    img = (rng.rand(1080, 1920, 3) * 255).astype(np.uint8)
    got, _ = letterbox_normalize_native(img)
    boxed, _ = letterbox_image(img)
    want = normalize_image(boxed)
    # 1920x1080 -> scale 0.4333 -> 468 rows, pad top/bottom
    np.testing.assert_allclose(got[:3], want[:3], atol=1e-6)
    np.testing.assert_allclose(got[-3:], want[-3:], atol=1e-6)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_normalize_native_matches_numpy(rng):
    from smap_tpu.data.native import normalize_native

    img = (rng.rand(512, 832, 3) * 255).astype(np.uint8)
    got = normalize_native(img)
    want = normalize_image(img)
    np.testing.assert_allclose(got, want, atol=1e-5)
