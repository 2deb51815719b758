"""Persistent XLA compilation cache.

The tunneled TPU's remote compile service is slow (minutes for the larger
correction graphs); caching compiled executables on disk makes every run
after the first fast. Enabled by all entry points (cli, bench, graft entry).
"""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/kmerax-jax")


def enable(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("KMERAX_COMPILE_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these options: run uncached
        pass
