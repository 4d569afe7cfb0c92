"""Import first in any standalone script that must run on host CPU.

The image's sitecustomize force-sets JAX_PLATFORMS=axon (remote TPU tunnel),
overriding shell env prefixes; this module re-overrides before jax loads.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
