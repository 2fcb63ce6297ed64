"""Relative-depth readout along limbs, kinematic depth chaining and
back-projection to absolute 3D.

Vectorized (vmappable, static-shape) equivalent of the reference's per-person
numpy post-processing (``exps/stage3_root2/test_util.py:45-99`` and
``lib/utils/post_3d.py:4-27`` in zju3dv/SMAP):

* ``read_limb_depths`` — sample the PAF delta-Z channel at 10 points along
  each detected limb, clip to the [10th, 90th] percentile, and average
  (test_util.py:60-86). The reference first upsamples the 14-channel map to
  input resolution with nearest-neighbor (test.py:120-126); with an integer
  stride that equals reading the base map at ``coord // stride``, so no
  upsampled tensor is ever materialized here.
* ``chain_depths`` — accumulate limb delta-Z from the pelvis outwards
  (test_util.py:45-57). The limb list is a tree in topological order, so a
  single pass over limbs (static unroll) resolves every joint.
* ``root_depths`` — absolute root depth = root-depth map value at the root
  pixel x focal x resize scale (test_util.py:66).
* ``back_project_bodies`` — un-letterbox 2D coords and lift to camera space
  with the intrinsics (test_util.py:89-99).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from smap_tpu.config import NUM_LIMBS, PAF_VECTOR
from smap_tpu.camera import back_project


def _nearest_upsampled_gather(base_map: jnp.ndarray, x: jnp.ndarray,
                              y: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Read ``cv2.resize(base, INTER_NEAREST)``-upsampled values without
    materializing the upsampled map: out[y, x] = base[y//stride, x//stride]."""
    h, w = base_map.shape[-2], base_map.shape[-1]
    xi = jnp.clip(x.astype(jnp.int32) // stride, 0, w - 1)
    yi = jnp.clip(y.astype(jnp.int32) // stride, 0, h - 1)
    return base_map[..., yi, xi]


def _sample_maps(maps: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                 stride: int) -> jnp.ndarray:
    """Nearest-upsampled readout of [C, Ho, Wo] maps at [C, ...] coords via
    the exact one-hot MXU formulation (scalar gathers serialize on TPU;
    smap_tpu.ops.sample)."""
    from smap_tpu.ops.sample import gather_2d

    c, h, w = maps.shape
    lead = x.shape[1:]
    xi = jnp.clip(x.astype(jnp.int32) // stride, 0, w - 1).reshape(c, -1)
    yi = jnp.clip(y.astype(jnp.int32) // stride, 0, h - 1).reshape(c, -1)
    return gather_2d(maps, xi, yi).reshape((c,) + lead)


def read_limb_depths(bodies_2d: jnp.ndarray, paf_z: jnp.ndarray, *,
                     stride: int = 4, num_samples: int = 10,
                     root_idx: int = 2) -> jnp.ndarray:
    """Per-limb delta-Z readout (reference: test_util.py:60-84).

    Args:
      bodies_2d: [P, J, 4] skeletons at *input* resolution (x, y, _, score).
      paf_z: [L, Ho, Wo] delta-Z channels at output resolution.

    Returns:
      depth_v: [P, L] average delta-Z per limb (0 where limb missing).
    """
    limb_pairs = jnp.asarray(PAF_VECTOR, jnp.int32)
    src = bodies_2d[:, limb_pairs[:, 0]]       # [P, L, 4]
    dst = bodies_2d[:, limb_pairs[:, 1]]
    limb_ok = (src[..., 3] > 0) & (dst[..., 3] > 0)        # [P, L]
    person_ok = bodies_2d[:, root_idx, 3] > 0              # [P]

    # np.round(np.linspace(a, b, 10)) — half-to-even rounding.
    t = jnp.linspace(0.0, 1.0, num_samples)                # [S]
    xs = jnp.round(src[..., 0:1] * (1 - t) + dst[..., 0:1] * t)
    ys = jnp.round(src[..., 1:2] * (1 - t) + dst[..., 1:2] * t)

    # [P, L, S] coords -> per-limb-channel sampling: [L, P, S]
    vals = jnp.moveaxis(
        _sample_maps(paf_z, jnp.moveaxis(xs, 1, 0), jnp.moveaxis(ys, 1, 0),
                     stride), 0, 1)                        # [P, L, S]

    lo = jnp.percentile(vals, 10.0, axis=-1, keepdims=True)
    hi = jnp.percentile(vals, 90.0, axis=-1, keepdims=True)
    clipped = jnp.clip(vals, lo, hi)
    mean = jnp.mean(clipped, axis=-1)                      # [P, L]
    return jnp.where(limb_ok & person_ok[:, None], mean, 0.0)


def chain_depths(depth_v: jnp.ndarray, scores: jnp.ndarray, *,
                 root_idx: int = 2, num_joints: int = 15) -> jnp.ndarray:
    """Chain per-limb delta-Z into per-joint relative depth
    (reference: test_util.py:45-57; both root branches).

    Args:
      depth_v: [P, L] limb delta-Z.
      scores: [P, J] joint detection scores (used only for output masking by
        callers; chaining itself is unconditional like the reference).
      root_idx: 2 (pelvis, the default SMAP configuration) or 0 (neck).

    Returns:
      rel_z: [P, J] root-relative depth (root joint = 0).
    """
    P = depth_v.shape[0]
    rel_z = jnp.zeros((P, num_joints), depth_v.dtype)
    if root_idx == 2:
        # pelvis = 0; neck = pelvis - dv[limb1]; head = neck + dv[limb0];
        # remaining limbs chained from index 2 (test_util.py:46-50).
        neck = -depth_v[:, 1]
        rel_z = rel_z.at[:, 0].set(neck)
        rel_z = rel_z.at[:, 1].set(neck + depth_v[:, 0])
        start = 2
    else:
        # neck = 0; head = neck + dv[limb0]; limbs from index 1
        # (test_util.py:51-53).
        rel_z = rel_z.at[:, 1].set(depth_v[:, 0])
        start = 1
    for k in range(start, NUM_LIMBS):
        s, d = PAF_VECTOR[k]
        rel_z = rel_z.at[:, d].set(rel_z[:, s] + depth_v[:, k])
    return rel_z


def root_depths(bodies_2d: jnp.ndarray, root_d_map: jnp.ndarray, *,
                scale: jnp.ndarray, f_x: jnp.ndarray, stride: int = 4,
                root_idx: int = 2) -> jnp.ndarray:
    """Absolute root depth per person (reference: test_util.py:65-66)."""
    x = bodies_2d[:, root_idx, 0]
    y = bodies_2d[:, root_idx, 1]
    vals = _nearest_upsampled_gather(root_d_map, x, y, stride)
    ok = bodies_2d[:, root_idx, 3] > 0
    return jnp.where(ok, vals * scale * f_x, 0.0)


def back_project_bodies(bodies_2d: jnp.ndarray, rel_z: jnp.ndarray,
                        root_depth: jnp.ndarray, K: jnp.ndarray, *,
                        scale: jnp.ndarray, net_w: float, net_h: float,
                        img_w: jnp.ndarray, img_h: jnp.ndarray,
                        root_idx: int = 2) -> jnp.ndarray:
    """Un-letterbox and back-project (reference: test_util.py:89-99).

    Returns [P, J, 4] = (X, Y, Z, score); rows/joints with score 0 are zero.
    """
    x = bodies_2d[..., 0] / scale - (net_w / scale - img_w) / 2.0
    y = bodies_2d[..., 1] / scale - (net_h / scale - img_h) / 2.0
    depth = rel_z + root_depth[:, None]
    pts = back_project(jnp.stack([x, y], axis=-1), depth, K)   # [P, J, 3]
    score = bodies_2d[..., 3]
    person_ok = score[:, root_idx:root_idx + 1] > 0
    joint_ok = (score > 0) & person_ok
    pts = jnp.where(joint_ok[..., None], pts, 0.0)
    return jnp.concatenate(
        [pts, jnp.where(joint_ok, score, 0.0)[..., None]], axis=-1)
