"""Persistent XLA compilation cache setup.

The limb-arithmetic graphs (unrolled schoolbook multiplies inside NTT
stages, MSM scan bodies) are large; first-compile costs tens of seconds.
Enabling JAX's persistent cache amortizes that across processes — pytest
runs, the demo CLI, and bench.py all reuse the same compiled artifacts.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")

_enabled = False


def enable_compilation_cache(path: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import hashlib

    import jax

    # The XLA:CPU executable (de)serialization in this jax build segfaults
    # on some large compiled programs (observed deterministically on the
    # device-prover executables), so the persistent cache is only enabled
    # for accelerator backends unless forced.
    if os.environ.get("JAX_PLATFORMS", "") == "cpu" and \
            os.environ.get("KZG_TPU_JAX_CACHE_FORCE", "0") != "1":
        _enabled = True
        return

    base = path or os.environ.get("KZG_TPU_JAX_CACHE", _DEFAULT_DIR)
    # Partition by platform + XLA flags: AOT entries record target machine
    # features derived from flags; loading a mismatched entry can SIGSEGV
    # (observed with --xla_force_host_platform_device_count toggling
    # prefer-no-scatter on XLA:CPU).
    tag = hashlib.sha1(
        (os.environ.get("JAX_PLATFORMS", "") + "|"
         + os.environ.get("XLA_FLAGS", "")).encode()).hexdigest()[:10]
    cache_dir = os.path.join(base, tag)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _enabled = True
