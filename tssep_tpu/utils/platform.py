"""Backend-selection helper for CLI entry points.

Some runtimes install a sitecustomize that force-registers a TPU plugin and
rewrites ``jax.config.jax_platforms``, which defeats the standard
``JAX_PLATFORMS=cpu python -m ...`` way of forcing a backend.  CLI mains call
:func:`honor_jax_platforms_env` to repair that — but only when the env-named
platform is *registered yet not preferred*.  An explicit in-process
``jax.config.update('jax_platforms', ...)`` (e.g. a test harness forcing a
virtual-device CPU mesh before invoking ``main()``) is never clobbered:
in that case the env value is either already first or not in the configured
list at all, and both cases are left untouched.
"""

from __future__ import annotations

import os

__all__ = ['honor_jax_platforms_env']


def honor_jax_platforms_env():
    """Promote the ``JAX_PLATFORMS`` env platform to preferred if the current
    config lists it behind another platform; no-op otherwise."""
    want = os.environ.get('JAX_PLATFORMS')
    if not want:
        return
    import jax
    current = jax.config.jax_platforms or ''
    members = [p for p in current.split(',') if p]
    if not members or members[0] == want or want not in members:
        return
    try:
        jax.config.update('jax_platforms', want)
    except Exception:  # noqa: BLE001 - backend already initialized
        pass
