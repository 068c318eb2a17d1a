"""JAX runtime configuration helpers."""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Enable the persistent XLA compilation cache.

    Compilation of the fused query/train programs takes minutes on a
    tunneled TPU; the cache makes every run after the first start hot.
    """
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "P2S_JAX_CACHE",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))),
                ".jax_cache",
            ),
        )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
