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


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Turn on JAX's persistent XLA compilation cache.

    Remote (axon) compiles cost 60-90 s each and serving at 104k items
    pays 36-115 s of compile before the first query on EVERY process
    start (benchmarks/military_scale.json) — the cache converts those
    to disk reads across restarts. Call AFTER ``import jax`` but any
    time before the first compile. Safe no-op if the backend's PJRT
    plugin cannot serialize executables (jax logs and skips).

    Respects ANNCUR_COMPILE_CACHE (path, or "0"/"off" to disable).
    Returns the cache dir in effect ("" when disabled).
    """
    env = os.environ.get("ANNCUR_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "none"):
        return ""
    import jax

    if not env and "cpu" in str(jax.config.jax_platforms or ""):
        # host-CPU compiles are cheap, and reloading XLA:CPU AOT results
        # warns about machine-feature mismatches (potential SIGILL);
        # the win is the 60-90 s REMOTE compiles — opt in explicitly via
        # ANNCUR_COMPILE_CACHE=<dir> to cache CPU programs anyway
        return ""
    cache_dir = env or cache_dir or os.path.expanduser("~/.cache/anncur_tpu/xla")
    os.makedirs(cache_dir, exist_ok=True)

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that took >1s to compile (the default 60s floor
    # would skip most of our 5-50s CPU-mesh compiles; remote compiles
    # all clear 1s anyway)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # knob name varies across jax versions
        pass
    return cache_dir


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
