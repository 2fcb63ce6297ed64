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

from smap_tpu.config import PAF_VECTOR


def _make_scene(rng, num_people=3, img_w=1920, img_h=1080, f=1500.0):
    """Random-ish people with plausible articulated geometry (cm units)."""
    K = np.array([[f, 0, img_w / 2], [0, f, img_h / 2], [0, 0, 1]])
    people = []
    for p in range(num_people):
        root = np.array([rng.uniform(-80, 80), rng.uniform(-20, 20),
                         rng.uniform(350, 700)])
        joints = np.zeros((15, 3))
        joints[2] = root
        # neck above pelvis, head above neck
        joints[0] = root + [rng.uniform(-5, 5), -55, rng.uniform(-8, 8)]
        joints[1] = joints[0] + [rng.uniform(-3, 3), -20, rng.uniform(-5, 5)]
        for (a, b), (dx, dy) in zip(
                PAF_VECTOR[2:], [(18, 2), (6, 28), (4, 26),     # right arm
                                 (-18, 2), (-6, 28), (-4, 26),  # left arm
                                 (10, 6), (4, 40), (2, 38),     # right leg
                                 (-10, 6), (-4, 40), (-2, 38)]):
            joints[b] = joints[a] + [dx + rng.uniform(-2, 2),
                                     dy + rng.uniform(-2, 2),
                                     rng.uniform(-12, 12)]
        people.append(joints)
    return K, people


def _render_outputs(people, K, img_w, img_h, out_h, out_w, stride, scale,
                    pad_x, pad_y, sigma=1.5):
    """Ideal maps at output resolution (normalized net scale x255/x127)."""
    ys, xs = np.mgrid[0:out_h, 0:out_w].astype(np.float64)
    hm = np.zeros((out_h, out_w, 15), np.float32)
    paf = np.zeros((out_h, out_w, 28), np.float32)
    paf_z = np.zeros((out_h, out_w, 14), np.float32)
    rd = np.zeros((out_h, out_w, 1), np.float32)

    proj = []
    for joints in people:
        uv = (K @ (joints / joints[:, 2:3]).T).T[:, :2]
        net = uv * scale + [pad_x, pad_y]
        proj.append(net / stride)            # output-res coords

    for pi, joints in enumerate(people):
        pts = proj[pi]
        for j in range(15):
            g = np.exp(-((xs - pts[j, 0]) ** 2 + (ys - pts[j, 1]) ** 2)
                       / (2 * sigma ** 2))
            hm[..., j] = np.maximum(hm[..., j], g)
        for li, (a, b) in enumerate(PAF_VECTOR):
            pa, pb = pts[a], pts[b]
            v = pb - pa
            norm = np.hypot(*v)
            if norm < 1:
                continue
            u = v / norm
            t = np.clip(((xs - pa[0]) * u[0] + (ys - pa[1]) * u[1]) / norm,
                        0, 1)
            px, py = pa[0] + t * v[0], pa[1] + t * v[1]
            band = np.hypot(xs - px, ys - py) < 2.0
            paf[..., 2 * li][band] = u[0]
            paf[..., 2 * li + 1][band] = u[1]
            paf_z[..., li][band] = joints[b, 2] - joints[a, 2]
        rx, ry = pts[2].astype(int)
        rd[max(ry - 2, 0):ry + 3, max(rx - 2, 0):rx + 3, 0] = (
            joints[2, 2] / K[0, 0] / scale)

    out2d = np.concatenate([hm * 255.0, paf * 127.0], axis=-1)
    return out2d, paf_z, rd


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

    K, people = _make_scene(rng)
    out2d, paf_z, rd = _render_outputs(people, K, img_w, img_h, out_h, out_w,
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
