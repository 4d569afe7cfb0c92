"""Backend pinning helpers.

This image's sitecustomize registers the remote-TPU ("axon") PJRT plugin in
every interpreter and merges it into ``jax_platforms`` ("axon,cpu"), so shell
``JAX_PLATFORMS=cpu`` prefixes do not stick.  ``jax.config.update`` after
import is deterministic; call these before any jax computation.
"""
from __future__ import annotations

import os


def force_cpu(n_virtual_devices: int | None = None) -> None:
    """Pin jax to host CPU; optionally fake an ``n``-device mesh.

    Works even if another backend (the axon TPU plugin) was already
    initialized in this process: backends are cleared first, then the platform
    and CPU device count are re-configured.  ``jax_num_cpu_devices`` is used
    instead of ``XLA_FLAGS=--xla_force_host_platform_device_count`` because
    XLA parses that flag once per process — too late if any backend ran first.
    """
    os.environ["JAX_PLATFORMS"] = "cpu"
    if n_virtual_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_virtual_devices}"
            ).strip()
    import jax

    try:
        import jax.extend.backend as _jeb

        _jeb.clear_backends()
    except Exception:
        pass
    jax.config.update("jax_platforms", "cpu")
    if n_virtual_devices is not None:
        try:
            jax.config.update("jax_num_cpu_devices", n_virtual_devices)
        except Exception:
            pass  # already pinned via XLA_FLAGS before any backend init


def force_tpu() -> None:
    """Pin jax to the TPU backend (single-chip axon tunnel in this image)."""
    import jax

    jax.config.update("jax_platforms", "axon,cpu")
