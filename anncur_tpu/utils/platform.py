"""Force an n-device virtual CPU platform (tests, drives, dryruns).

The hard-won environment recipe (CLAUDE.md) in ONE place: the
JAX_PLATFORMS env var route is unreliable when a TPU plugin is
installed, so the authoritative sequence is (1) put
--xla_force_host_platform_device_count=<n> into XLA_FLAGS — REPLACING
any existing count, a stale value silently yields the wrong mesh size —
then (2) `jax.config.update("jax_platforms", "cpu")` after importing
jax but before any backend initialization.
"""

from __future__ import annotations

import os
import re


def force_cpu_devices(n_devices: int, verify: bool = True) -> None:
    """Must be called BEFORE the first jax operation."""
    flag = f"--xla_force_host_platform_device_count={n_devices}"
    existing = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" in existing:
        existing = re.sub(
            r"--xla_force_host_platform_device_count=\d+", flag, existing
        )
        os.environ["XLA_FLAGS"] = existing
    else:
        os.environ["XLA_FLAGS"] = (existing + " " + flag).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if verify:
        devs = jax.devices()
        if len(devs) < n_devices or devs[0].platform != "cpu":
            raise RuntimeError(
                f"could not force {n_devices} CPU devices (got {len(devs)} "
                f"{devs[0].platform}); the XLA backend was likely initialized "
                "before force_cpu_devices was called — call it first in a "
                "fresh process"
            )
