"""Persistent XLA compilation cache.

Compiled programs are cached on disk keyed by HLO hash, so repeat runs of the
same fit shapes skip compilation entirely — including across processes.
Verified to work through this machine's remote-compile TPU service
(0.8s -> 0.07s on a toy program). The in-process jit cache already handles
repeat calls within one process (api._fit_program is module-level for this).
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None, tpu_only: bool = True) -> str | None:
    """Enable JAX's on-disk compilation cache. Returns the cache dir used
    (None if skipped).

    Default location: ``$CLONEALIGN_TPU_CACHE`` or ``~/.cache/clonealign_tpu/xla``.

    ``tpu_only`` (default): skip on CPU backends — XLA:CPU AOT results encode
    host machine features, and reloading an entry compiled on/for a different
    CPU can SIGILL (observed: cache entries from a remote-compile service
    loaded on a host missing +prefer-no-scatter). TPU executables are tied to
    the chip generation, which doesn't vary under one cache directory.
    """
    import jax

    if tpu_only and jax.default_backend() != "tpu":
        return None
    if path is None:
        path = os.environ.get(
            "CLONEALIGN_TPU_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "clonealign_tpu", "xla"),
        )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    return path
