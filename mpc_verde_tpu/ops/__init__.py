from .integrators import (
    euler_step,
    rk4_step,
    rk4_step_with_quadrature,
    rk45_step,
    discretize,
    c2d,
    DiscreteSimulator,
)
from .linearize import linearize_dynamics, quadratize_cost, linearize_trajectory
from .parallel_riccati import lqt_backward_parallel, lqt_gains, lqt_solve_parallel
