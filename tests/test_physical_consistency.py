"""Physical consistency: ideal network maps -> decoded 3D == ground truth.

Builds a synthetic scene (people with known 3D joints and camera), renders
the *ideal* network outputs (Gaussian heatmaps, unit-vector PAFs with
delta-Z third channel, normalized root-depth map) exactly as the training
labels define them, then runs the full jitted post-processing pipeline and
checks the reconstructed absolute 3D skeletons against the ground truth.
This validates the entire decode math chain (NMS sub-pixel, association,
depth readout, chaining, un-letterboxing, back-projection) on physically
consistent data — not just against implementation oracles.
"""

import numpy as np
import pytest

from scenes import make_scene, render_outputs


def test_decoded_3d_matches_ground_truth(rng):
    import jax.numpy as jnp

    from smap_tpu.config import PostProcessConfig
    from smap_tpu.ops.postprocess import ScaleInfo, postprocess_batch

    img_w, img_h = 1920, 1080
    net_w, net_h = 832, 512
    stride = 4
    out_w, out_h = net_w // stride, net_h // stride
    scale = min(net_w / img_w, net_h / img_h)
    pad_y = (net_h - img_h * scale) // 2
    pad_x = 0.0

    K, people = make_scene(rng)
    out2d, paf_z, rd = render_outputs(people, K, img_w, img_h, out_h, out_w,
                                       stride, scale, pad_x, pad_y)

    info = ScaleInfo(
        scale=jnp.asarray([scale], jnp.float32),
        img_w=jnp.asarray([float(img_w)], jnp.float32),
        img_h=jnp.asarray([float(img_h)], jnp.float32),
        fx=jnp.asarray([K[0, 0]], jnp.float32),
        fy=jnp.asarray([K[1, 1]], jnp.float32),
        cx=jnp.asarray([K[0, 2]], jnp.float32),
        cy=jnp.asarray([K[1, 2]], jnp.float32))
    res = postprocess_batch(
        jnp.asarray(out2d[None]), jnp.asarray(paf_z[None]),
        jnp.asarray(rd[None]), info, PostProcessConfig(max_peaks=31),
        net_w=float(net_w), net_h=float(net_h), stride=stride)

    n = int(np.asarray(res.count)[0])
    assert n == len(people)
    got = np.asarray(res.bodies_3d)[0, :n]

    # match decoded people to GT by root proximity
    gt_roots = np.stack([p[2] for p in people])
    for i in range(n):
        d = np.linalg.norm(gt_roots - got[i, 2, :3], axis=1)
        gi = int(np.argmin(d))
        gt = people[gi]
        detected = got[i, :, 3] > 0
        assert detected.sum() >= 13          # nearly all joints assembled
        err = np.linalg.norm(got[i, detected, :3] - gt[detected], axis=1)
        # decode tolerance: heatmap quantization (stride 4 at ~0.43 scale
        # is ~9px object space ~ a few cm at 4-7 m) + depth band averaging
        assert np.median(err) < 12.0, err
        # root depth accurate
        assert abs(got[i, 2, 2] - gt[2, 2]) < 6.0
