"""Respect an explicit JAX_PLATFORMS env var in entry points.

A site plugin in this environment force-registers the tunneled TPU
platform and overrides ``jax_platforms`` at import time, so setting
``JAX_PLATFORMS=cpu`` alone does not keep jax off the TPU client -- and
with the tunnel down, the first backend probe hangs indefinitely.  Entry
points call :func:`respect_jax_platforms` right after their first jax
import (the same recipe as tests/conftest.py) so an explicit env choice
wins; without the env var, behavior is unchanged (TPU by default).
"""

from __future__ import annotations

import os

__all__ = ["respect_jax_platforms"]


def respect_jax_platforms() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        jax.config.update("jax_platforms", want)
