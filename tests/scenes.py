"""Synthetic-scene rendering shared by the physical-consistency test and
the golden-parity corpus (tests/test_golden.py): people with known 3D
joints and camera, plus the IDEAL network outputs those joints imply
(Gaussian heatmaps, unit-vector PAFs, delta-Z, normalized root depth) —
exactly the training-label definitions (smap_tpu/data/labels.py,
reference lib/preprocess/representation.py)."""

import numpy as np

from smap_tpu.config import PAF_VECTOR


def make_scene(rng, num_people=3, img_w=1920, img_h=1080, f=1500.0):
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


def render_outputs(people, K, img_w, img_h, out_h, out_w, stride, scale,
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
