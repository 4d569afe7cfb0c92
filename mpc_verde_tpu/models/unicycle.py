"""Differential-drive (unicycle) kinematics.

Reference: ``Casadi/single_shooting_v1.py:70-74`` defines
``rhs = [v cos(theta), v sin(theta), omega]`` with states (x, y, theta) and
controls (v, omega); the same ode appears as a numpy callable at
``Trajectory Tracking/Trajectory_tracking.py:40-45`` and
``mpctools/multiple_shooting_mpctools.py:37-42``.
"""
from __future__ import annotations

import jax.numpy as jnp

from .base import Model

UNICYCLE_NX = 3
UNICYCLE_NU = 2


def _rhs(x, u, p=None):
    theta = x[2]
    v, omega = u[0], u[1]
    return jnp.stack([v * jnp.cos(theta), v * jnp.sin(theta), omega])


unicycle = Model(f=_rhs, nx=UNICYCLE_NX, nu=UNICYCLE_NU, np=0, name="unicycle")
