"""Test configuration: CPU backend with a virtual 8-device mesh and x64.

Multi-chip behaviour is validated on a fake mesh exactly as SURVEY.md §4
prescribes: ``--xla_force_host_platform_device_count=8`` (no pod needed).
x64 is enabled so golden comparisons against scipy run at full precision;
the TPU deployment path is f32 and is exercised by bench.py / __graft_entry__.
"""
import os

# NOTE: must be a hard override — the image's sitecustomize.py force-sets
# JAX_PLATFORMS=axon (remote TPU) in every interpreter, so shell-level
# `JAX_PLATFORMS=cpu` prefixes do NOT survive to jax import time.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# sitecustomize merges platforms into "axon,cpu" (TPU first); config.update is
# the only deterministic way to pin the backend after that.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
