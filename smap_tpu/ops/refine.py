"""RefineNet lifting: build per-person inputs and fold predictions back.

Vectorized equivalent of ``lift_and_refine_3d_pose``
(``exps/stage3_root2/test_util.py:102-131`` in zju3dv/SMAP): per person,
the input is a 15x5 table [2D xy, root-relative XYZ] (root row holds the
absolute values), flattened to 75; the MLP output (15x3 root-relative) is
re-anchored at the predicted root.
"""

from __future__ import annotations

import jax.numpy as jnp

from smap_tpu.config import NUM_JOINTS, ROOT_IDX


def build_refine_input(bodies_2d: jnp.ndarray, bodies_3d: jnp.ndarray,
                       *, root_idx: int = ROOT_IDX) -> jnp.ndarray:
    """[P, J, 4] x2 -> [P, J*5] RefineNet input (test_util.py:105-116)."""
    P, J = bodies_2d.shape[0], bodies_2d.shape[1]
    root2d = bodies_2d[:, root_idx, :2]                      # [P, 2]
    root3d = bodies_3d[:, root_idx, :3]
    joint_ok = bodies_3d[..., 3] > 0                         # [P, J]

    rel2d = bodies_2d[..., :2] - root2d[:, None, :]
    rel3d = bodies_3d[..., :3] - root3d[:, None, :]
    feat = jnp.concatenate([rel2d, rel3d], axis=-1)          # [P, J, 5]
    feat = jnp.where(joint_ok[..., None], feat, 0.0)
    root_feat = jnp.concatenate([root2d, root3d], axis=-1)   # [P, 5]
    feat = feat.at[:, root_idx, :].set(root_feat)
    return feat.reshape(P, J * 5)


def apply_refinement(pred_rel: jnp.ndarray, bodies_3d: jnp.ndarray,
                     *, root_idx: int = ROOT_IDX) -> jnp.ndarray:
    """Fold MLP output back to absolute 3D (test_util.py:123-131).

    Args:
      pred_rel: [P, J*3] root-relative refined pose.
      bodies_3d: [P, J, 4] pre-refinement absolute pose.

    Returns:
      [P, J, 4]; score column = 1 for persons with a detected root, 0 else.
    """
    P, J = bodies_3d.shape[0], bodies_3d.shape[1]
    pred = pred_rel.reshape(P, J, 3)
    root3d = bodies_3d[:, root_idx, :3]
    out = pred + root3d[:, None, :]
    out = out.at[:, root_idx, :].set(root3d)
    person_ok = bodies_3d[:, root_idx, 3] > 0
    score = jnp.broadcast_to(person_ok[:, None].astype(jnp.float32), (P, J))
    return jnp.concatenate([out, score[..., None]], axis=-1)
