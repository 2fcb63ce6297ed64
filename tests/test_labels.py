"""Label-synthesis parity vs. the reference's cv2/numpy implementation.

dataset/representation.py in /root/reference imports only cv2+numpy, so it
serves directly as the golden oracle.
"""

import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

from dataset.representation import (generate_heatmap, generate_paf,  # noqa: E402
                                    generate_rdepth)


def _random_bodys(rng, P=4, J=15, w=416, h=256, with_depth=True):
    bodys = np.zeros((P, J, 11), np.float64)
    bodys[..., 0] = rng.uniform(0, w - 1, (P, J))
    bodys[..., 1] = rng.uniform(0, h - 1, (P, J))
    bodys[..., 2] = rng.uniform(50, 500, (P, J)) if with_depth else 0
    bodys[..., 3] = rng.randint(0, 3, (P, J))
    bodys[..., 7] = 1200.0
    return bodys


def test_heatmaps_match_reference(rng):
    import jax.numpy as jnp
    from smap_tpu.data.labels import synthesize_heatmaps

    h, w, stride = 256, 416, 4
    out_shape = (h // stride, w // stride)
    bodys = _random_bodys(rng, h=h, w=w)
    kernels = [15, 11, 9, 7, 5]

    ours = synthesize_heatmaps(jnp.asarray(bodys[..., :2]),
                               jnp.asarray(bodys[..., 3]),
                               out_shape, stride, kernels)
    for lvl, k in enumerate(kernels):
        ref = generate_heatmap(bodys, out_shape, stride, 15, kernel=(k, k))
        got = np.moveaxis(np.asarray(ours[lvl]), -1, 0)
        np.testing.assert_allclose(got, ref, atol=1e-3)


@pytest.mark.parametrize("level,with_mds", [(0, True), (1, True), (4, True),
                                            (0, False)])
def test_pafs_match_reference(rng, level, with_mds):
    import jax.numpy as jnp
    from smap_tpu.data.labels import synthesize_pafs

    h, w, stride = 256, 416, 4
    out_shape = (h // stride, w // stride)
    bodys = _random_bodys(rng)
    thre = max(1, 3 - level) * 1.0
    params = {"stride": stride, "crop_size_y": h, "crop_size_x": w}

    from smap_tpu.config import PAF_VECTOR
    ref = generate_paf(bodys, out_shape, params, 14,
                       [list(p) for p in PAF_VECTOR], thre, with_mds)

    joints_int = np.trunc(bodys[..., :3])
    min_vis = 2 if (thre > 1 and with_mds) else 1
    ours = synthesize_pafs(jnp.asarray(joints_int), jnp.asarray(bodys[..., 3]),
                           out_shape, stride, float(thre), min_vis)
    got = np.moveaxis(np.asarray(ours), -1, 0)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-4)


def test_rdepth_matches_reference(rng):
    import jax.numpy as jnp
    from smap_tpu.data.labels import synthesize_rdepth

    bodys = _random_bodys(rng)
    meta = {"bodys": bodys, "scale": 0.37}
    ref = generate_rdepth(meta, 4, 2, 20)
    ours = synthesize_rdepth(jnp.asarray(bodys), jnp.asarray(0.37), 4, 20)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-6)


def test_full_label_stack_shapes(rng):
    import jax.numpy as jnp
    from smap_tpu.data.labels import synthesize_labels

    bodys = _random_bodys(rng)
    labels, rdepth = synthesize_labels(
        jnp.asarray(bodys), jnp.asarray(0.5), (64, 104), 4,
        [15, 11, 9, 7, 5], 1.0, True, 20)
    assert labels.shape == (5, 64, 104, 57)
    assert rdepth.shape == (20, 3)


def test_gaussian_kernels_match_cv2():
    import cv2
    from smap_tpu.data.labels import _gaussian_kernel_1d

    for k in [1, 3, 5, 7, 9, 11, 15, 21]:
        ref = cv2.getGaussianKernel(k, 0).ravel()
        np.testing.assert_allclose(_gaussian_kernel_1d(k), ref, atol=1e-7)
