"""Honor the ``JAX_PLATFORMS`` env var under site-customized JAX installs.

Some environments (e.g. this one's TPU PJRT plugin) import jax from
``sitecustomize`` at interpreter start and force-set the ``jax_platforms``
config, which makes a plain ``JAX_PLATFORMS=cpu`` env var a no-op: env vars
only seed the config default, and an explicit ``config.update`` wins.  CLI
entry points call :func:`apply_platform_env` before any backend use so that
``JAX_PLATFORMS=cpu python tools/train.py ...`` behaves as documented.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    """Re-apply ``JAX_PLATFORMS`` on top of any sitecustomize override.

    No-op when the env var is unset or when the backend is already
    initialized (too late to switch platforms).
    """
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    try:
        from jax._src import xla_bridge
        if xla_bridge._backends:  # backend live: switching is impossible
            return
    except Exception:  # pragma: no cover - private API moved
        # can't tell whether a backend is live; attempt the update anyway
        # but never let a too-late update crash the caller
        pass
    try:
        jax.config.update("jax_platforms", want)
    except Exception as e:  # pragma: no cover - backend already initialized
        import logging
        logging.getLogger(__name__).warning(
            "JAX_PLATFORMS=%s could not be applied (backend already "
            "initialized?): %s", want, e)
