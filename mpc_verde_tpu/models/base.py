"""Model abstraction: continuous-time dynamics as pure jittable functions.

The reference expresses dynamics as CasADi symbolic RHS expressions
(``Casadi/single_shooting_v1.py:70-74``) or plain-numpy ode callables fed to
``mpc.getCasadiFunc`` (``Trajectory Tracking/Trajectory_tracking.py:40-45``).
Here a model is just ``f(x, u, p) -> xdot`` traced by JAX — differentiation is
free via ``jax.jacfwd`` and the same function serves controller and plant.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp

# Continuous-time RHS: (x, u, p) -> dx/dt.  `p` may be ignored.
RHS = Callable[[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class Model:
    """A continuous-time dynamical system.

    Attributes:
      f: RHS function ``f(x, u, p) -> xdot`` (pure, jittable).
      nx: state dimension.
      nu: control dimension.
      np: per-stage parameter dimension consumed by ``f`` (0 if unused).
      name: identifier for logs/plots.
    """

    f: RHS
    nx: int
    nu: int
    np: int = 0
    name: str = "model"

    def __call__(self, x, u, p=None):
        return self.f(x, u, p)


@dataclasses.dataclass(frozen=True)
class LinearModel(Model):
    """LTI model ``xdot = Ac x + Bc u`` with its matrices kept for c2d/expm.

    Mirrors the reference's pattern of defining ``Ac``/``Bc`` numpy arrays and
    wrapping them in a matmul callable
    (``Inverted_pendulum/inverted_pendulum_single_shooting_mpctools.py:19-27``,
    ``Trajectory Tracking/Trajectory_tracking_le_LTI.py:39-51``).
    """

    Ac: Optional[jnp.ndarray] = None
    Bc: Optional[jnp.ndarray] = None


def linear_model(Ac, Bc, name: str = "linear") -> LinearModel:
    Ac = jnp.asarray(Ac, dtype=jnp.float64 if jnp.array(0.0).dtype == jnp.float64 else jnp.float32)
    Bc = jnp.asarray(Bc, dtype=Ac.dtype)
    nx, nu = Bc.shape

    def f(x, u, p=None):
        return Ac @ x + Bc @ u

    return LinearModel(f=f, nx=nx, nu=nu, np=0, name=name, Ac=Ac, Bc=Bc)
