"""Exact 2D map sampling at integer coordinates, MXU-formulated.

Scalar gathers serialize at ~40 ns/element on the target TPU backend
(docs/perf_notes.md), so point lookups on device are re-expressed as
one-hot matmuls: map[y, x] == sum_w (onehot(y) @ map) * onehot(x). One-hot
operands are exact in bf16 and each output element is a single product, so
splitting the f32 map into bf16 terms (smap_tpu.ops.paf._split_bf16)
reconstructs f32 values exactly at 3 terms.

Used by the depth readout (smap_tpu/ops/depth.py) — the same trick at PAF
line-integral scale lives in smap_tpu/ops/paf.py + pallas_kernels.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _resolve_impl(impl: str) -> str:
    if impl != "auto":
        return impl
    return "gather" if jax.default_backend() == "cpu" else "onehot"


def gather_2d(maps: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, *,
              impl: str = "auto", parts: int = 3) -> jnp.ndarray:
    """maps[c, y[c, n], x[c, n]] for integer coordinate arrays.

    Args:
      maps: [C, H, W] float32 maps.
      x, y: [C, N] int32 coordinates (already clipped in range).

    Returns:
      [C, N] float32 sampled values (exact at parts=3).
    """
    if _resolve_impl(impl) == "gather":
        return jax.vmap(lambda m, xx, yy: m[yy, xx])(maps, x, y)

    from smap_tpu.ops.paf import _split_bf16

    c, h, w = maps.shape
    mparts = jnp.concatenate(_split_bf16(maps, parts), axis=1)  # [C, pH, W]
    oy = jax.nn.one_hot(y, h, dtype=jnp.bfloat16)               # [C, N, H]
    oyp = jnp.concatenate([oy] * parts, axis=-1)                # [C, N, pH]
    rows = jnp.einsum("cnh,chw->cnw", oyp, mparts,
                      preferred_element_type=jnp.float32)       # [C, N, W]
    ox = jax.nn.one_hot(x, w, dtype=jnp.float32)                # [C, N, W]
    return jnp.sum(rows * ox, axis=-1)
