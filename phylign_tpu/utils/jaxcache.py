"""Persistent XLA compilation cache.

Extension/chain/match jits compile once per shape bucket; through this
environment's remote-compile relay a cold compile of the extension scan costs
minutes. The persistent cache cuts a cold align run from ~217 s to ~10 s
(measured), and across pipeline runs it makes compilation a one-time cost.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = Path.home() / ".cache" / "phylign_tpu" / "jax"
_enabled = False


def enable(cache_dir: str | os.PathLike | None = None) -> None:
    """Idempotently point JAX at a persistent compilation cache directory.
    An explicit JAX_COMPILATION_CACHE_DIR in the environment wins."""
    global _enabled
    if _enabled or os.environ.get("PHYLIGN_TPU_NO_JAX_CACHE"):
        return
    import jax

    if jax.default_backend() != "tpu":
        # CPU executables cached via the remote-compile path carry the
        # compile server's machine features; loading them on this host warns
        # loudly and risks SIGILL. The cache only pays off for TPU compiles.
        _enabled = True
        return

    target = os.environ.get("JAX_COMPILATION_CACHE_DIR") or str(
        cache_dir or _DEFAULT
    )
    Path(target).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", target)
    # cache everything, including small/fast-compiling programs
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    _enabled = True
