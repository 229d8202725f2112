"""Persistent XLA compilation cache.

The big UNet programs take minutes to compile through the TPU relay (the
512² img UNet alone ~9 min cold); the JAX persistent cache cuts a repeat
process to seconds (measured 542 s → 75 s). Entry points (main.py, bench.py,
__graft_entry__, examples) call `enable_persistent_cache()` before building
models. Opt out with IPDM_NO_COMP_CACHE=1.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/jax_comp_cache")


def enable_persistent_cache(path: str | None = None) -> None:
    if os.environ.get("IPDM_NO_COMP_CACHE"):
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path or DEFAULT_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without the knobs
