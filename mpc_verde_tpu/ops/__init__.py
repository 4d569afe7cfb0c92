from .integrators import (
    euler_step,
    rk4_step,
    rk4_step_with_quadrature,
    discretize,
    c2d,
    DiscreteSimulator,
)
from .linearize import linearize_dynamics, quadratize_cost, linearize_trajectory
