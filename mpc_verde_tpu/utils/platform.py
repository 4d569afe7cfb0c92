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
    and CPU device count are re-configured.  The device count is requested
    both ways — ``XLA_FLAGS=--xla_force_host_platform_device_count`` (only
    effective if no backend has run yet, since XLA parses the flag once per
    process) and ``jax_num_cpu_devices`` (effective after ``clear_backends``)
    — and verified at the end, so a silent failure of either path raises
    instead of surfacing later as a confusing too-few-devices mesh error.
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
        cleared = True
    except Exception:
        cleared = False  # jax API moved; only fatal if the count check fails
    jax.config.update("jax_platforms", "cpu")
    if n_virtual_devices is not None:
        try:
            jax.config.update("jax_num_cpu_devices", n_virtual_devices)
        except Exception:
            # raises if a backend is (still) initialized; XLA_FLAGS may have
            # pinned the count at process start anyway — verified below
            pass
        n = jax.device_count()
        if n < n_virtual_devices:
            raise RuntimeError(
                f"force_cpu: requested {n_virtual_devices} virtual CPU devices "
                f"but only {n} are visible (backends "
                f"{'were' if cleared else 'could NOT be'} cleared). Start the "
                "process with JAX_PLATFORMS=cpu XLA_FLAGS="
                f"--xla_force_host_platform_device_count={n_virtual_devices}, "
                "or call force_cpu before any jax computation."
            )


def force_tpu() -> None:
    """Pin jax to the TPU backend (single-chip axon tunnel in this image)."""
    import jax

    jax.config.update("jax_platforms", "axon,cpu")
