"""RefineNet: per-person pose completion/denoising MLP.

Equivalent of the reference's 5-layer MLP (``model/refinenet.py:5-37`` in
zju3dv/SMAP): [2D pose + root-relative 3D pose] (15x5 flattened = 75) ->
refined root-relative 3D pose (15x3 = 45), with BatchNorm + ReLU between
linear layers.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from smap_tpu.config import RefineNetConfig


class RefineNet(nn.Module):
    cfg: RefineNetConfig = RefineNetConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, h in enumerate(self.cfg.hidden):
            x = nn.Dense(h, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"layer{i + 1}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             param_dtype=jnp.float32, name=f"bn{i + 1}")(x)
            x = nn.relu(x)
        return nn.Dense(self.cfg.out_dim, dtype=self.dtype,
                        param_dtype=jnp.float32, name="layer5")(x)
