"""Backend/platform helpers for multi-device validation without TPUs.

This environment's axon sitecustomize force-sets JAX_PLATFORMS=axon
(one remote TPU chip) and overrides the environment variable, so
multi-device code paths are validated on a VIRTUAL CPU mesh: the
device count comes from --xla_force_host_platform_device_count and the
CPU platform must be forced via the config API before the backend
initialises (tests/conftest.py applies the same workaround inline,
since it must run before this package is importable under pytest).
"""

from __future__ import annotations

import os
import re

_COUNT_FLAG = "--xla_force_host_platform_device_count"


def force_virtual_cpu(n_devices: int) -> None:
    """Point jax at >= ``n_devices`` virtual CPU devices.

    Sets (or raises) the host-platform device count in XLA_FLAGS and
    forces the CPU platform. Must run before the jax backend
    initialises — once a backend exists the config update is a no-op,
    in which case callers see whatever devices that backend has.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    m = re.search(re.escape(_COUNT_FLAG) + r"=(\d+)", flags)
    if m is None:
        os.environ["XLA_FLAGS"] = f"{flags} {_COUNT_FLAG}={n_devices}".strip()
    elif int(m.group(1)) < n_devices:
        os.environ["XLA_FLAGS"] = flags.replace(
            m.group(0), f"{_COUNT_FLAG}={n_devices}"
        )
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass  # backend already initialised
