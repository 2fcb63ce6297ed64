"""Persistent XLA compilation cache setup.

WARNING: on the axon TPU runtime this is actively harmful — cached
artifacts come back as XLA:CPU AOT executables that then run on the host
(~0.08 TFLOPS instead of the TPU's tens of TFLOPS; verified with
scripts/_fallback_probe*.py). ``enable_compilation_cache`` is therefore a
no-op unless SMAP_TPU_JAX_CACHE is explicitly set, for use on standard
TPU/CPU deployments where the cache behaves correctly.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = None) -> None:
    import jax

    path = path or os.environ.get("SMAP_TPU_JAX_CACHE")
    if not path:
        return
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
