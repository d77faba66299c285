"""Test harness: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host CPU devices (the driver separately dry-runs the multi-chip
path via __graft_entry__.dryrun_multichip).

NOTE: this environment's sitecustomize force-registers the axon TPU backend
and overrides JAX_PLATFORMS, so env vars alone do NOT select CPU; the
``jax.config.update`` below is what actually does it. The 8-device flag must
still be set before the CPU backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
