"""Persistent XLA compilation cache.

First-compile of the 256² train step costs minutes on TPU; every driver
(CLI, bench, graft entry) calls ``enable_compilation_cache()`` so repeat
runs load compiled programs from disk instead.
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_compilation_cache(path: str | None = None) -> None:
    global _ENABLED
    if _ENABLED:
        return
    import jax

    path = path or os.environ.get(
        "POSE_TRANSFER_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "pose_transfer_tpu", "xla"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        return  # older jax: silently skip
    _ENABLED = True
