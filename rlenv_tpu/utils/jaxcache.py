"""Persistent XLA compilation-cache setup that actually takes effect.

On this box every Python interpreter imports jax at STARTUP (the axon
PJRT plugin registers via sitecustomize), so jax's env-var-derived
config — including ``JAX_COMPILATION_CACHE_DIR`` — is frozen before any
user code runs. ``os.environ.setdefault(...)`` in a script is therefore
a silent no-op: discovered in round 5, when the test suite was measured
recompiling every program on every run despite a populated cache dir.
The only reliable mechanism is ``jax.config.update`` after import,
which this helper centralizes for the suite (tests/conftest.py),
bench.py, __graft_entry__.py and the run scripts.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None,
                            min_compile_secs: float = 0.2) -> str:
    """Point jax's persistent compilation cache at ``path`` (default:
    ``<repo>/.jax_cache``) unless one is already configured; returns the
    active cache dir."""
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:
        # Respect an existing dir, but still lower the persistence
        # threshold if it sits at jax's 1.0 s default — the small fused
        # kernels this cache exists for compile in 0.2-1.0 s and would
        # otherwise silently never be persisted.
        if jax.config.jax_persistent_cache_min_compile_time_secs == 1.0:
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              min_compile_secs)
        return current
    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
