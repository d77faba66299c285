"""JAX backend resolution for this environment.

The runtime environment pins ``JAX_PLATFORMS`` (e.g. ``axon``, the
TPU-relay plugin) so a broken TPU init fails loudly instead of silently
falling back to CPU. The relay registers itself from a sitecustomize that
its own ``PYTHONPATH`` entry makes importable — and swallows registration
errors (a clobbered PYTHONPATH, a claim hiccup), which turns EVERY entry
point into ``Unable to initialize backend 'axon': ... known backends:
['cpu', 'tpu']``.

``ensure_backend()`` keeps both properties: it tries the pinned platform
list first, and when the pinned name is not registered at all it
re-resolves to whatever accelerator exists — still refusing to silently
land on CPU unless ``allow_cpu`` is set (tests pass allow_cpu=True;
bench refuses, so a CPU fallback can never be recorded as a TPU number).
"""

from __future__ import annotations

import logging

log = logging.getLogger("phylign_tpu.platform")


def ensure_backend(allow_cpu: bool = True) -> str:
    """Initialize a usable JAX backend; returns its platform name.

    Call before any other backend touch (first call wins in JAX). Safe to
    call multiple times."""
    import jax

    try:
        dev = jax.devices()[0]
        return dev.platform
    except RuntimeError as e:
        if "not in the list of known backends" not in str(e):
            raise
        log.warning(
            "pinned JAX platform unavailable (%s); re-resolving automatically",
            str(e).split(".")[0],
        )
    jax.config.update("jax_platforms", "")
    dev = jax.devices()[0]
    if dev.platform == "cpu" and not allow_cpu:
        raise RuntimeError(
            "no accelerator backend available and allow_cpu=False "
            f"(resolved devices: {jax.devices()})"
        )
    if dev.platform == "cpu":
        log.warning("no accelerator backend found; running on CPU")
    return dev.platform
