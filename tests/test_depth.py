"""Golden tests for depth readout, chaining and back-projection."""

import numpy as np

from oracle import generate_relz_oracle, gen_3d_pose_oracle


def _fake_bodies(rng, P=5, J=15, w=832, h=512):
    bodies = np.zeros((P, J, 4), np.float32)
    bodies[..., 0] = rng.uniform(0, w - 1, (P, J))
    bodies[..., 1] = rng.uniform(0, h - 1, (P, J))
    bodies[..., 3] = (rng.rand(P, J) > 0.2) * rng.rand(P, J)
    bodies[0, 2, 3] = 0.0          # person with missing root
    bodies[1, :, 3] = 0.7          # fully detected person
    return bodies


def test_depth_pipeline_matches_oracle(rng):
    import cv2
    import jax.numpy as jnp

    from smap_tpu.ops.depth import (back_project_bodies, chain_depths,
                                    read_limb_depths, root_depths)

    Ho, Wo, L = 128, 208, 14
    stride = 4
    paf_z = rng.randn(L, Ho, Wo).astype(np.float32)
    root_d = rng.rand(Ho, Wo).astype(np.float32) * 5
    bodies = _fake_bodies(rng)
    scale = {"scale": 0.40625, "f_x": 1500.0, "f_y": 1490.0,
             "cx": 1024.0, "cy": 512.0, "img_width": 2048.0,
             "img_height": 1260.3, "net_width": 832.0, "net_height": 512.0}

    # --- oracle path (materialized nearest-upsampled maps, like test.py) ---
    paf_up = cv2.resize(paf_z.transpose(1, 2, 0), (832, 512),
                        interpolation=cv2.INTER_NEAREST)
    root_up = cv2.resize(root_d, (832, 512), interpolation=cv2.INTER_NEAREST)
    oracle_bodies = bodies.copy()
    oracle_roots = generate_relz_oracle(oracle_bodies, paf_up, root_up, scale)
    oracle_3d = gen_3d_pose_oracle(oracle_bodies, oracle_roots, scale)

    # --- ours ---
    jb = jnp.asarray(bodies)
    depth_v = read_limb_depths(jb, jnp.asarray(paf_z), stride=stride)
    rel_z = chain_depths(depth_v, jb[..., 3])
    roots = root_depths(jb, jnp.asarray(root_d),
                        scale=scale["scale"], f_x=scale["f_x"], stride=stride)
    K = np.array([[scale["f_x"], 0, scale["cx"]],
                  [0, scale["f_y"], scale["cy"]], [0, 0, 1]], np.float32)
    ours_3d = back_project_bodies(
        jb, rel_z, roots, jnp.asarray(K), scale=scale["scale"],
        net_w=scale["net_width"], net_h=scale["net_height"],
        img_w=scale["img_width"], img_h=scale["img_height"])

    np.testing.assert_allclose(np.asarray(roots), oracle_roots, rtol=1e-5)
    # joint-level z: oracle writes chained z into bodies[:, :, 2]
    person_ok = bodies[:, 2, 3] > 0
    limb_mask = np.asarray(depth_v) != 0
    # spot-check chained depth where oracle chained them
    for p in range(len(bodies)):
        if not person_ok[p]:
            continue
        np.testing.assert_allclose(np.asarray(rel_z)[p, 2], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours_3d), oracle_3d,
                               rtol=1e-4, atol=1e-4)


def test_chain_depths_topology():
    import jax.numpy as jnp
    from smap_tpu.ops.depth import chain_depths

    depth_v = np.zeros((1, 14), np.float32)
    depth_v[0, 1] = 2.0    # neck->pelvis delta
    depth_v[0, 0] = 1.0    # neck->head delta
    depth_v[0, 2] = 0.5    # neck->rsho
    depth_v[0, 3] = 0.25   # rsho->relb
    rel = np.asarray(chain_depths(jnp.asarray(depth_v),
                                  jnp.ones((1, 15))))
    assert rel[0, 2] == 0.0
    assert rel[0, 0] == -2.0          # neck = pelvis - dv[1]
    assert rel[0, 1] == -1.0          # head = neck + dv[0]
    assert rel[0, 9] == -1.5          # rsho = neck + dv[2]
    assert rel[0, 10] == -1.25        # relb = rsho + dv[3]


def test_chain_depths_neck_root():
    """root_idx=0 (neck) branch matches reference chain_bones semantics."""
    import jax.numpy as jnp
    from smap_tpu.ops.depth import chain_depths
    from smap_tpu.config import PAF_VECTOR

    rng = np.random.RandomState(3)
    dv = rng.randn(2, 14).astype(np.float32)
    rel = np.asarray(chain_depths(jnp.asarray(dv), jnp.ones((2, 15)),
                                  root_idx=0))
    # reference loop: neck=0; head = neck + dv[0]; limbs 1.. chained
    want = np.zeros((2, 15), np.float32)
    want[:, 1] = dv[:, 0]
    for k in range(1, 14):
        s, d = PAF_VECTOR[k]
        want[:, d] = want[:, s] + dv[:, k]
    np.testing.assert_allclose(rel, want, rtol=1e-6)
    assert np.all(rel[:, 0] == 0)


def test_gather_2d_onehot_matches_gather(rng):
    """ops.sample.gather_2d: the MXU one-hot formulation is bit-exact
    against the direct gather (bf16x3 split, single-product outputs)."""
    import jax.numpy as jnp

    from smap_tpu.ops.sample import gather_2d

    maps = (rng.rand(14, 32, 52).astype(np.float32) - 0.5) * 4
    x = rng.randint(0, 52, (14, 40)).astype(np.int32)
    y = rng.randint(0, 32, (14, 40)).astype(np.int32)
    ref = np.asarray(gather_2d(jnp.asarray(maps), jnp.asarray(x),
                               jnp.asarray(y), impl="gather"))
    got = np.asarray(gather_2d(jnp.asarray(maps), jnp.asarray(x),
                               jnp.asarray(y), impl="onehot"))
    np.testing.assert_array_equal(got, ref)
