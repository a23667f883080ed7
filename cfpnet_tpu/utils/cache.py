"""Persistent XLA compilation cache.

First compile of the full 480x640 model takes minutes (remote compile over
the axon tunnel); enabling the on-disk cache makes every subsequent process
start in seconds. Called by all CLI drivers.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "/root/.cache/jax_comp_cache") -> None:
    import jax

    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
