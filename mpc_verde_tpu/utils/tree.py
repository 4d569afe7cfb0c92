"""Small pytree helpers shared across the framework."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_where(pred, a, b):
    """Select between two pytrees elementwise on a scalar/broadcastable predicate."""
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)
