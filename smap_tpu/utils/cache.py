"""Persistent XLA compilation cache setup.

Compiles through the TPU runtime are expensive (minutes for the full
model); enabling JAX's persistent compilation cache makes every
recompilation after the first process-instant. Call before any jit
executes.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = None) -> None:
    import jax

    path = path or os.environ.get(
        "SMAP_TPU_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
