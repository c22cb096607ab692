"""Small runtime utilities."""

from __future__ import annotations

import os


def enable_fast_prng():
    """Use the TPU hardware RBG PRNG for jax.random keys: the default
    threefry generator costs several ms per step in the event buffers; RBG is
    near-free and statistically ample for Monte Carlo transport sampling."""
    import jax

    try:
        jax.config.update("jax_default_prng_impl", "rbg")
    except Exception:
        pass


def enable_compilation_cache(path: str | None = None):
    """Persistent XLA compilation cache: the fused simulation step is a large
    program and the TPU remote-compile path can take minutes; caching makes
    repeat runs start instantly."""
    import jax

    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "nanokappa_jax"),
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs
