"""Platform bootstrap shared by every entry point.

Some environments register a TPU platform plugin via sitecustomize at
interpreter start, which overrides the JAX_PLATFORMS env var — the
config must be set explicitly before the first backend use. Call this
at the top of any entry point (main.py, __graft_entry__.py, scripts)
BEFORE other jax-touching imports.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        # backend already initialized — the env either took effect at
        # startup or the caller deliberately initialized another platform
        pass
