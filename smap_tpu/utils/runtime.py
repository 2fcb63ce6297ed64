"""Runtime/platform setup shared by the CLIs.

Standard JAX selects backends from the ``JAX_PLATFORMS`` env var. Some
managed runtimes (the tunneled axon TPU relay used for development)
register their PJRT plugin from ``sitecustomize`` and then call
``jax.config.update("jax_platforms", "axon,cpu")``, silently overriding
whatever the user exported — so ``JAX_PLATFORMS=cpu python
scripts/train_smap.py`` would still initialize (or fatally fail to
initialize) the device backend. ``apply_platform_env`` restores the
standard contract: if the user set ``JAX_PLATFORMS``, re-apply it over
any plugin override before the first backend lookup.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    """Make an explicit ``JAX_PLATFORMS`` env var win over plugin
    overrides. No-op when the env var is unset (plugin/default order
    stands) or when backends are already initialized (too late to
    change — leave whatever the process committed to)."""
    platforms = os.environ.get("JAX_PLATFORMS")
    if not platforms:
        return
    import jax
    from jax._src import xla_bridge

    if xla_bridge.backends_are_initialized():
        return
    jax.config.update("jax_platforms", platforms)
