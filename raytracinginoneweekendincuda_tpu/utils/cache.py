"""Persistent XLA compilation cache.

The axon TPU relay compiles remotely; the mega2 whole-frame jit takes
30-190 s per (shape, schedule) variant.  JAX's persistent compilation
cache works over the relay (measured: 51.6 s -> 5.0 s on a second
process), so every entry point enables it.  Opt out with
RTOW_NO_COMPILE_CACHE=1; relocate with RTOW_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import os


def enable_compile_cache() -> None:
    if os.environ.get("RTOW_NO_COMPILE_CACHE") == "1":
        return
    import jax

    path = os.environ.get("RTOW_COMPILE_CACHE_DIR",
                          os.path.expanduser("~/.cache/rtow_xla"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax without the knobs: run uncached
